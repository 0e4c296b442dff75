from multivolumes_tpu.scene import state, volume

__all__ = ["state", "volume"]
