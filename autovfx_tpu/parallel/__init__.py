from autovfx_tpu.parallel.mesh import make_mesh
from autovfx_tpu.parallel.sharding import (
    dp_train_step,
    sharded_render,
)

__all__ = ["make_mesh", "dp_train_step", "sharded_render"]
