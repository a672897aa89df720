from multih_tpu.models import labeling, mixed, pipeline, selection

__all__ = ["labeling", "mixed", "pipeline", "selection"]
