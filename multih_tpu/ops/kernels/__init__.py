from multih_tpu.ops.kernels import residual_kernel

__all__ = ["residual_kernel"]
