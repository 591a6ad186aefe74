from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.core.cameras import Camera

__all__ = ["Gaussians", "Camera"]
