from multih_tpu.utils import data, evaluation

__all__ = ["data", "evaluation"]
