"""multivolumes_tpu — a TPU-native multi-volume renderer.

A from-scratch JAX/Pallas rebuild of the capabilities of StarsX/MultiVolumes
(SIGGRAPH Asia 2021 "Viewport-Resolution Independent Anti-Aliased Ray
Marching on Interior Faces in Cube-Map Space", demo III): many animated 3D
density volumes rendered via per-volume cube-map-space ray marching with
adaptive LOD, inter-volume light-space marching/self-shadowing, SH
environment lighting, opaque-mesh occlusion + shadow mapping, 8-layer
order-independent transparency, and temporal AA.

Where the reference (see /root/reference, `MultiVolumes/MultiVolumes.cpp`)
drives a D3D12 GPU through command lists, barriers, ExecuteIndirect and work
graphs, this engine renders each frame as a single jitted pure function over
HBM-resident volume arrays: Pallas/MXU plane-sweep kernels for the marching
hot loops, plain JAX for culling, LOD, lighting and compositing, and
`jax.sharding` over a device mesh for multi-chip scaling.
"""

from multivolumes_tpu.config import RenderConfig, SharedConsts

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "SharedConsts",
]
