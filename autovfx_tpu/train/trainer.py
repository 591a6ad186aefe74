"""3DGS training loop (jitted step + host-side densification cadence).

Parity target: ``sugar/gaussian_splatting/train.py:29-188`` (the fork's
trainer with mono-depth / mono-normal / pseudo-normal / alpha /
anisotropic losses) and ``scene/gaussian_model.py:159-199``
(per-parameter Adam groups + exponential xyz LR schedule,
``get_expon_lr_func`` in utils/general_utils.py).

TPU-first: one jitted ``train_step`` renders, computes all losses,
applies a hand-rolled per-field Adam (explicit m/v pytrees so
densification can zero moments of reallocated slots in-jit), and
accumulates densification stats.  Camera data-parallelism over a device
mesh lives in autovfx_tpu/parallel.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera, index_camera
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.knn import mean_knn_dist2
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.train import losses as L
from autovfx_tpu.train.densify import (
    DensifyResult,
    DensifyStats,
    densify_and_prune,
    reset_opacity,
)

PARAM_FIELDS = (
    "xyz",
    "sh_dc",
    "sh_rest",
    "log_scales",
    "quats",
    "opacity_logit",
)


@flax.struct.dataclass
class TrainConfig:
    # optimization (OptimizationParams, gs_model.py:40-62)
    iterations: int = flax.struct.field(pytree_node=False, default=15_000)
    position_lr_init: float = flax.struct.field(
        pytree_node=False, default=0.00016
    )
    position_lr_final: float = flax.struct.field(
        pytree_node=False, default=0.0000016
    )
    position_lr_delay_mult: float = flax.struct.field(
        pytree_node=False, default=0.01
    )
    position_lr_max_steps: int = flax.struct.field(
        pytree_node=False, default=30_000
    )
    feature_lr: float = flax.struct.field(pytree_node=False, default=0.0025)
    opacity_lr: float = flax.struct.field(pytree_node=False, default=0.05)
    scaling_lr: float = flax.struct.field(pytree_node=False, default=0.005)
    rotation_lr: float = flax.struct.field(pytree_node=False, default=0.001)
    spatial_lr_scale: float = flax.struct.field(pytree_node=False, default=5.0)
    lambda_dssim: float = flax.struct.field(pytree_node=False, default=0.2)
    # extra regularizers (train.py:96-132); 0 disables
    lambda_depth: float = flax.struct.field(pytree_node=False, default=0.0)
    lambda_normal: float = flax.struct.field(pytree_node=False, default=0.0)
    lambda_pseudo_normal: float = flax.struct.field(
        pytree_node=False, default=0.0
    )
    lambda_alpha: float = flax.struct.field(pytree_node=False, default=0.0)
    lambda_anisotropic: float = flax.struct.field(
        pytree_node=False, default=0.0
    )
    scene_scale: float = flax.struct.field(pytree_node=False, default=5.0)
    # densification (arguments/__init__.py:88-95)
    percent_dense: float = flax.struct.field(pytree_node=False, default=0.01)
    densification_interval: int = flax.struct.field(
        pytree_node=False, default=100
    )
    opacity_reset_interval: int = flax.struct.field(
        pytree_node=False, default=3000
    )
    densify_from_iter: int = flax.struct.field(pytree_node=False, default=500)
    densify_until_iter: int = flax.struct.field(
        pytree_node=False, default=15_000
    )
    densify_grad_threshold: float = flax.struct.field(
        pytree_node=False, default=0.0002
    )
    min_opacity: float = flax.struct.field(pytree_node=False, default=0.005)
    size_threshold: Optional[int] = flax.struct.field(
        pytree_node=False, default=20
    )
    raster: RasterConfig = flax.struct.field(
        pytree_node=False, default=RasterConfig()
    )


@flax.struct.dataclass
class AdamState:
    m: Gaussians
    v: Gaussians
    count: jax.Array

    @classmethod
    def zero(cls, g: Gaussians) -> "AdamState":
        zeros = jax.tree_util.tree_map(jnp.zeros_like, g)
        return cls(m=zeros, v=zeros, count=jnp.zeros((), jnp.int32))


@flax.struct.dataclass
class TrainState:
    gaussians: Gaussians
    adam: AdamState
    stats: DensifyStats
    step: jax.Array


def position_lr(step, cfg: TrainConfig) -> jax.Array:
    """Exponential log-lerp LR with warmup delay (general_utils.py:23-48)."""
    init = cfg.position_lr_init * cfg.spatial_lr_scale
    final = cfg.position_lr_final * cfg.spatial_lr_scale
    t = jnp.clip(step / cfg.position_lr_max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        jnp.log(init) * (1 - t) + jnp.log(jnp.maximum(final, 1e-12)) * t
    )
    return log_lerp


def field_lrs(step, cfg: TrainConfig) -> dict:
    return {
        "xyz": position_lr(step, cfg),
        "sh_dc": cfg.feature_lr,
        "sh_rest": cfg.feature_lr / 20.0,
        "log_scales": cfg.scaling_lr,
        "quats": cfg.rotation_lr,
        "opacity_logit": cfg.opacity_lr,
    }


def init_gaussians_from_points(
    xyz: jax.Array, rgb: jax.Array, sh_degree: int = 3
) -> Gaussians:
    """create_from_pcd parity (gaussian_model.py:134-157): isotropic
    scale = sqrt(mean 3-NN squared distance), opacity 0.1."""
    d2 = jnp.maximum(mean_knn_dist2(xyz), 1e-7)
    scale = jnp.sqrt(d2)
    return Gaussians.create(
        xyz, rgb, sh_degree=sh_degree, initial_scale=scale
    )


def init_state(g: Gaussians) -> TrainState:
    return TrainState(
        gaussians=g,
        adam=AdamState.zero(g),
        stats=DensifyStats.zero(g.capacity),
        step=jnp.zeros((), jnp.int32),
    )


class StepAux(NamedTuple):
    loss: jax.Array
    psnr: jax.Array
    overflow: jax.Array


def compute_loss(
    g: Gaussians,
    mean2d_offset: jax.Array,
    cam: Camera,
    gt_rgb: jax.Array,
    cfg: TrainConfig,
    gt_depth: jax.Array | None = None,
    gt_normal: jax.Array | None = None,
):
    bg = jnp.zeros((3,), jnp.float32)
    out = rasterize(
        g, cam, bg=bg, config=cfg.raster, mean2d_offset=mean2d_offset
    )
    loss = L.photometric_loss(out.color, gt_rgb, cfg.lambda_dssim)
    if cfg.lambda_depth and gt_depth is not None:
        loss += cfg.lambda_depth * L.depth_loss(
            out.depth, gt_depth, cfg.scene_scale
        )
    if cfg.lambda_normal and gt_normal is not None:
        # normal image pass (second rasterization with normals as colors)
        dirs = g.xyz - cam.center[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        normals01 = g.normals(view_dirs=dirs) * 0.5 + 0.5
        n_out = rasterize(
            g, cam, config=cfg.raster, override_color=normals01
        )
        normal_img = (n_out.color - 0.5) * 2.0
        loss += cfg.lambda_normal * L.normal_loss(
            normal_img, gt_normal, out.depth, cfg.scene_scale
        )
    if cfg.lambda_pseudo_normal and gt_normal is not None:
        rays = cam.ray_directions()
        pts = cam.center + rays * out.depth[..., None]
        pseudo = L.depth_to_normal(pts)
        loss += cfg.lambda_pseudo_normal * L.normal_loss(
            pseudo, gt_normal, out.depth, cfg.scene_scale
        )
    if cfg.lambda_alpha:
        loss += cfg.lambda_alpha * L.opacity_loss(out.alpha)
    if cfg.lambda_anisotropic:
        loss += cfg.lambda_anisotropic * L.anisotropic_loss(
            g.scales, g.active
        )
    return loss, (out.radii, out.overflow, L.psnr(out.color, gt_rgb))


def apply_adam(
    g: Gaussians,
    adam: AdamState,
    param_grads: dict,
    step: jax.Array,
    cfg: TrainConfig,
) -> tuple[Gaussians, AdamState]:
    """Per-field Adam update masked to active slots (shared by the
    sequential trainer and the DP path in autovfx_tpu/parallel)."""
    lrs = field_lrs(step, cfg)
    b1, b2, eps = 0.9, 0.999, 1e-15
    count = adam.count + 1
    bc1 = 1 - b1 ** count.astype(jnp.float32)
    bc2 = 1 - b2 ** count.astype(jnp.float32)

    new_params, new_m, new_v = {}, {}, {}
    for f in PARAM_FIELDS:
        gr = param_grads[f]
        m = b1 * getattr(adam.m, f) + (1 - b1) * gr
        v = b2 * getattr(adam.v, f) + (1 - b2) * gr * gr
        update = lrs[f] * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        mask = g.active.reshape((-1,) + (1,) * (gr.ndim - 1))
        new_params[f] = getattr(g, f) - jnp.where(mask, update, 0.0)
        new_m[f] = m
        new_v[f] = v

    g_new = g.replace(**new_params)
    adam_new = AdamState(
        m=adam.m.replace(**new_m),
        v=adam.v.replace(**new_v),
        count=count,
    )
    return g_new, adam_new


def train_step(
    state: TrainState,
    cam: Camera,
    gt_rgb: jax.Array,
    cfg: TrainConfig,
    gt_depth: jax.Array | None = None,
    gt_normal: jax.Array | None = None,
):
    g = state.gaussians
    offset0 = jnp.zeros((g.capacity, 2), jnp.float32)

    def loss_fn(params: dict, offset):
        g_cur = g.replace(**params)
        return compute_loss(
            g_cur, offset, cam, gt_rgb, cfg, gt_depth, gt_normal
        )

    params = {f: getattr(g, f) for f in PARAM_FIELDS}
    (loss, (radii, overflow, psnr)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, offset0)
    param_grads, mean2d_grad = grads

    g_new, adam = apply_adam(g, state.adam, param_grads, state.step, cfg)
    stats = state.stats.update(mean2d_grad, radii, cam.width, cam.height)
    new_state = TrainState(
        gaussians=g_new, adam=adam, stats=stats, step=state.step + 1
    )
    return new_state, StepAux(loss=loss, psnr=psnr, overflow=overflow)


def densify_step(
    state: TrainState, key: jax.Array, cfg: TrainConfig, iteration: int
) -> tuple[TrainState, DensifyResult]:
    size_thr = (
        cfg.size_threshold
        if (cfg.size_threshold and iteration > cfg.opacity_reset_interval)
        else None
    )
    res = densify_and_prune(
        state.gaussians,
        state.stats,
        key,
        grad_threshold=cfg.densify_grad_threshold,
        min_opacity=cfg.min_opacity,
        extent=cfg.spatial_lr_scale,
        percent_dense=cfg.percent_dense,
        max_screen_size=size_thr,
    )
    # zero Adam moments of (re)written slots (cat_tensors_to_optimizer)
    def zero_new(x):
        mask = res.new_mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(mask, 0.0, x)

    adam = AdamState(
        m=jax.tree_util.tree_map(zero_new, state.adam.m),
        v=jax.tree_util.tree_map(zero_new, state.adam.v),
        count=state.adam.count,
    )
    return (
        TrainState(
            gaussians=res.gaussians,
            adam=adam,
            stats=res.stats,
            step=state.step,
        ),
        res,
    )


def reset_opacity_step(state: TrainState) -> TrainState:
    g = reset_opacity(state.gaussians)
    # reference resets the opacity optimizer state too
    zero_op = lambda s: s.replace(opacity_logit=jnp.zeros_like(s.opacity_logit))
    adam = AdamState(
        m=zero_op(state.adam.m), v=zero_op(state.adam.v),
        count=state.adam.count,
    )
    return state.replace(gaussians=g, adam=adam)


def train(
    g: Gaussians,
    cams: Camera,
    images: jax.Array,
    cfg: TrainConfig,
    key: jax.Array | None = None,
    log_every: int = 0,
    depths: jax.Array | None = None,
    normals: jax.Array | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
):
    """Host training loop (train.py:29-188 cadence).

    ``checkpoint_path``/``checkpoint_every``: periodic full-state saves
    (reference ``checkpoint_iterations``) so long trainings resume
    after interruption via ``train.checkpoint.load_checkpoint``.

    cams: batched Camera pytree (F cameras); images: (F, H, W, 3).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    state = init_state(g)
    n_cams = images.shape[0]

    step_fn = jax.jit(
        lambda s, cam, img, d, nrm: train_step(
            s, cam, img, cfg, gt_depth=d, gt_normal=nrm
        )
    )
    densify_fn = jax.jit(
        lambda s, k, it: densify_step(s, k, cfg, it), static_argnums=(2,)
    )
    reset_fn = jax.jit(reset_opacity_step)

    history = []
    for it in range(1, cfg.iterations + 1):
        key, k1, k2 = jax.random.split(key, 3)
        ci = int(jax.random.randint(k1, (), 0, n_cams))
        cam = index_camera(cams, ci)
        d = depths[ci] if depths is not None else None
        nrm = normals[ci] if normals is not None else None
        state, aux = step_fn(state, cam, images[ci], d, nrm)

        if it < cfg.densify_until_iter:
            if (
                it > cfg.densify_from_iter
                and it % cfg.densification_interval == 0
            ):
                state, res = densify_fn(state, k2, it)
            if it % cfg.opacity_reset_interval == 0:
                state = reset_fn(state)

        if checkpoint_path and checkpoint_every and (
            it % checkpoint_every == 0 or it == cfg.iterations
        ):
            from autovfx_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_path, state)
        if log_every and it % log_every == 0:
            history.append(
                {
                    "iter": it,
                    "loss": float(aux.loss),
                    "psnr": float(aux.psnr),
                    "active": int(state.gaussians.num_active),
                }
            )
    return state, history
