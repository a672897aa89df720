from multih_tpu.parallel import sharding

__all__ = ["sharding"]
