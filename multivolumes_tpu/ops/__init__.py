from multivolumes_tpu.ops import trilinear

__all__ = ["trilinear"]
