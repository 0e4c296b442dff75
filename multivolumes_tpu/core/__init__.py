from multivolumes_tpu.core import math3d, camera, halton, sh

__all__ = ["math3d", "camera", "halton", "sh"]
