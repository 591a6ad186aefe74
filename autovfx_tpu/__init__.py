"""autovfx_tpu — a TPU-native, JAX/Pallas re-design of the AutoVFX pipeline.

AutoVFX (reference: haoyuhsu/autovfx) is a physically-realistic,
language-driven video editing pipeline built on CUDA 3D Gaussian
Splatting + Blender.  This package provides the same capability
surface re-designed for TPU hardware:

- ``autovfx_tpu.core``      Gaussian stores, camera math, SH, IO.
- ``autovfx_tpu.ops``       Pallas tile rasterizer (fwd/bwd), KNN, BVH.
- ``autovfx_tpu.train``     3DGS training (losses, densification).
- ``autovfx_tpu.sugar``     SuGaR density field / mesh extraction / refinement.
- ``autovfx_tpu.physics``   Jitted rigid-body contact solver (replaces Bullet).
- ``autovfx_tpu.render``    Envmap shading, shadow catcher, compositor
  (replaces Blender Cycles passes + ``blender/blend_all.py``).
- ``autovfx_tpu.edit``      Edit DSL + SceneRepresentation + JSON edit IR.
- ``autovfx_tpu.gpt``       LMP program-synthesis engine (GPT planner).
- ``autovfx_tpu.parallel``  Device-mesh sharding (camera-DP, Gaussian-sharded
  rendering) over ICI.
"""

__version__ = "0.1.0"

from autovfx_tpu.core.gaussians import Gaussians  # noqa: F401
from autovfx_tpu.core.cameras import Camera  # noqa: F401
