from autovfx_tpu.ops.rasterize import rasterize, RasterConfig, RenderOutput

__all__ = ["rasterize", "RasterConfig", "RenderOutput"]
