"""Stage-by-stage TPU liveness bisect for the rasterizer path.

Runs each pipeline stage in its own subprocess with a hard timeout so a
hung Mosaic kernel (uninterruptible in-process) can't stall the sweep.
Usage: python scripts/tpu_bisect.py [stage ...]
"""
import os
import subprocess
import sys

STAGES = {
    # name -> code executed in a fresh subprocess
    "matmul": """
import jax.numpy as jnp
print(float((jnp.ones((512,512))@jnp.ones((512,512))).sum()))
""",
    "preprocess": """
from autovfx_tpu.utils.synthetic import make_garden_like
from autovfx_tpu.core import cameras as C
from autovfx_tpu.ops import projection
import jax, numpy as np
g = make_garden_like(50_000, extent=2.67)
cam = C.look_at_camera([2.6,0,1.4],[0,0,0.2],[0,0,1],fx=190,fy=190,width=256,height=256)
s = jax.jit(lambda g: projection.preprocess(g, cam, tile=32))(g)
print("tiles", int(s.tiles_touched.sum()))
""",
    "pack_rows": """
from autovfx_tpu.utils.synthetic import make_garden_like
from autovfx_tpu.ops import preprocess_pallas as PP
import jax
g = make_garden_like(50_000, extent=2.67)
rows = jax.jit(PP.pack_scene_rows)(g)
print("rows", rows.shape, float(rows.sum()))
""",
    "fill": """
from autovfx_tpu.ops import fill_pallas as FP
import jax.numpy as jnp, jax, numpy as np
k = 4096
starts = jnp.asarray(np.arange(0, k, 7, dtype=np.int32))
vals = [jnp.asarray(np.arange(0, k, 7, dtype=np.int32))]
(v0,) = FP.monotone_fill(starts, vals, k)
print("fill", int(v0[-1]))
""",
    "bin_xla": """
import os; os.environ["AUTOVFX_COMPACT_PRESORT"]="0"
from autovfx_tpu.utils.synthetic import make_garden_like
from autovfx_tpu.core import cameras as C
from autovfx_tpu.ops import projection, binning
import jax
g = make_garden_like(50_000, extent=2.67)
cam = C.look_at_camera([2.6,0,1.4],[0,0,0.2],[0,0,1],fx=190,fy=190,width=256,height=256)
s = jax.jit(lambda g: projection.preprocess(g, cam, tile=32))(g)
b = jax.jit(lambda s: binning.bin_splats(s, 256, 256, tile=32, chunk=128,
    dup_budget=1<<17, fill_backend="xla"))(s)
print("bin_xla ok", int(b.tile_chunks.sum()))
""",
    "bin_pallas_nocompact": """
import os; os.environ["AUTOVFX_COMPACT_PRESORT"]="0"
from autovfx_tpu.utils.synthetic import make_garden_like
from autovfx_tpu.core import cameras as C
from autovfx_tpu.ops import projection, binning
import jax
g = make_garden_like(50_000, extent=2.67)
cam = C.look_at_camera([2.6,0,1.4],[0,0,0.2],[0,0,1],fx=190,fy=190,width=256,height=256)
s = jax.jit(lambda g: projection.preprocess(g, cam, tile=32))(g)
b = jax.jit(lambda s: binning.bin_splats(s, 256, 256, tile=32, chunk=128,
    dup_budget=1<<17, fill_backend="pallas"))(s)
print("bin_pallas ok", int(b.tile_chunks.sum()))
""",
    "bin_pallas_compact": """
from autovfx_tpu.utils.synthetic import make_garden_like
from autovfx_tpu.core import cameras as C
from autovfx_tpu.ops import projection, binning
import jax
g = make_garden_like(50_000, extent=2.67)
cam = C.look_at_camera([2.6,0,1.4],[0,0,0.2],[0,0,1],fx=190,fy=190,width=256,height=256)
s = jax.jit(lambda g: projection.preprocess(g, cam, tile=32))(g)
b = jax.jit(lambda s: binning.bin_splats(s, 256, 256, tile=32, chunk=128,
    dup_budget=1<<17, fill_backend="pallas"))(s)
print("bin_pallas_compact ok", int(b.tile_chunks.sum()))
""",
    "raster_ref": """
from autovfx_tpu.utils.synthetic import make_garden_like
from autovfx_tpu.core import cameras as C
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
import jax, jax.numpy as jnp
g = make_garden_like(50_000, extent=2.67)
cam = C.look_at_camera([2.6,0,1.4],[0,0,0.2],[0,0,1],fx=190,fy=190,width=256,height=256)
cfg = RasterConfig(dup_budget=1<<17, backend="ref", tile=32, chunk=128)
out = jax.jit(lambda g: rasterize(g, cam, bg=jnp.zeros(3), config=cfg))(g)
print("ref", float(out.color.mean()))
""",
    "raster_pallas_f32": """
from autovfx_tpu.utils.synthetic import make_garden_like
from autovfx_tpu.core import cameras as C
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
import jax, jax.numpy as jnp
g = make_garden_like(50_000, extent=2.67)
cam = C.look_at_camera([2.6,0,1.4],[0,0,0.2],[0,0,1],fx=190,fy=190,width=256,height=256)
cfg = RasterConfig(dup_budget=1<<17, backend="pallas", tile=32, chunk=128,
                   feature_pack="f32")
out = jax.jit(lambda g: rasterize(g, cam, bg=jnp.zeros(3), config=cfg))(g)
print("pallas_f32", float(out.color.mean()))
""",
    "raster_pallas_bf16": """
from autovfx_tpu.utils.synthetic import make_garden_like
from autovfx_tpu.core import cameras as C
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
import jax, jax.numpy as jnp
g = make_garden_like(50_000, extent=2.67)
cam = C.look_at_camera([2.6,0,1.4],[0,0,0.2],[0,0,1],fx=190,fy=190,width=256,height=256)
cfg = RasterConfig(dup_budget=1<<17, backend="pallas", tile=32, chunk=128,
                   feature_pack="bf16")
out = jax.jit(lambda g: rasterize(g, cam, bg=jnp.zeros(3), config=cfg))(g)
print("pallas_bf16", float(out.color.mean()))
""",
}

PRELUDE = """
import os, jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
"""


def main():
    names = sys.argv[1:] or list(STAGES)
    timeout = int(os.environ.get("BISECT_TIMEOUT", 240))
    for name in names:
        code = PRELUDE + STAGES[name]
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout,
                capture_output=True, text=True,
            )
            tail = (r.stdout.strip().splitlines() or [""])[-1]
            err = (r.stderr.strip().splitlines() or [""])[-1]
            status = "OK" if r.returncode == 0 else f"rc={r.returncode}"
            print(f"[{name}] {status}: {tail}"
                  + (f" | {err}" if r.returncode else ""), flush=True)
        except subprocess.TimeoutExpired:
            print(f"[{name}] HUNG (> {timeout}s)", flush=True)


if __name__ == "__main__":
    main()
