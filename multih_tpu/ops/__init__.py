from multih_tpu.ops import geometry, sampling

__all__ = ["geometry", "sampling"]
