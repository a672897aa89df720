from multih_tpu.models import labeling, pipeline, selection

__all__ = ["labeling", "pipeline", "selection"]
