"""Coarse SuGaR training: 3DGS loss + entropy + SDF/density regularization.

Parity target: ``sugar_trainers/coarse_density.py:18-889`` (used by
train_3dgs.sh step 2, 15k→22k iters): RGB L1+DSSIM (:550) + the fork's
extra losses (:552-590), entropy regularization (:593-606), and from
``regularize_from`` on, the 1M-sample density/SDF regularization
(:128,:166,:668-779) with neighbor resets every 500 iters (:614-616)
and low-opacity pruning at regularization start (:500-511).
``coarse_sdf.py`` = sdf_estimation_mode='sdf'.
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera, index_camera
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.rasterize import rasterize
from autovfx_tpu.sugar import regularization as REG
from autovfx_tpu.train import trainer as T


@flax.struct.dataclass
class SugarConfig:
    base: T.TrainConfig = T.TrainConfig()
    entropy_weight: float = flax.struct.field(pytree_node=False, default=0.1)
    sdf_weight: float = flax.struct.field(pytree_node=False, default=1.0)
    normal_weight: float = flax.struct.field(pytree_node=False, default=0.1)
    sdf_mode: str = flax.struct.field(
        pytree_node=False, default="density"
    )  # 'density' | 'sdf'
    regularize_from: int = flax.struct.field(pytree_node=False, default=9000)
    entropy_until: int = flax.struct.field(pytree_node=False, default=9000)
    # 1M samples/iter matches the reference (coarse_density.py:166);
    # tests pass smaller budgets explicitly
    n_sdf_samples: int = flax.struct.field(
        pytree_node=False, default=1_000_000
    )
    neighbor_reset_interval: int = flax.struct.field(
        pytree_node=False, default=500
    )
    prune_opacity_at_reg_start: float = flax.struct.field(
        pytree_node=False, default=0.5
    )


def sugar_losses(
    g: Gaussians,
    cam: Camera,
    out_depth: jax.Array,
    out_alpha: jax.Array,
    key: jax.Array,
    cfg: SugarConfig,
    regularize: bool,
):
    """Extra SuGaR terms for the current iteration (jit-safe)."""
    loss = 0.0
    if cfg.entropy_weight:
        loss += cfg.entropy_weight * REG.opacity_entropy_loss(g)
    if regularize and cfg.sdf_weight:
        samples = REG.sample_sdf_points(g, key, cfg.n_sdf_samples)
        if cfg.sdf_mode == "sdf":
            loss += cfg.sdf_weight * REG.sdf_regularization_loss(
                g, samples, cam, out_depth, out_alpha
            )
        else:
            loss += cfg.sdf_weight * REG.density_regularization_loss(
                g, samples, cam, out_depth, out_alpha
            )
        if cfg.normal_weight:
            loss += cfg.normal_weight * REG.normal_consistency_loss(
                g, samples
            )
    return loss


def coarse_train(
    g: Gaussians,
    cams: Camera,
    images: jax.Array,
    cfg: SugarConfig,
    key: Optional[jax.Array] = None,
    log_every: int = 0,
):
    """Host loop: 3DGS step + SuGaR terms (coarse_density.py skeleton)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    state = T.init_state(g)
    n_cams = images.shape[0]
    base = cfg.base

    def step(state, cam, img, k, regularize: bool):
        g_cur = state.gaussians
        params = {f: getattr(g_cur, f) for f in T.PARAM_FIELDS}
        offset0 = jnp.zeros((g_cur.capacity, 2), jnp.float32)

        def loss_fn(params, offset):
            gg = g_cur.replace(**params)
            loss, (radii, overflow, psnr) = T.compute_loss(
                gg, offset, cam, img, base
            )
            out = rasterize(gg, cam, config=base.raster)
            loss += sugar_losses(
                gg, cam, out.depth, out.alpha, k, cfg, regularize
            )
            return loss, (radii, overflow, psnr)

        (loss, (radii, overflow, psnr)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset0)
        param_grads, mean2d_grad = grads
        g_new, adam = T.apply_adam(
            g_cur, state.adam, param_grads, state.step, base
        )
        new_state = T.TrainState(
            gaussians=g_new,
            adam=adam,
            stats=state.stats.update(
                mean2d_grad, radii, cam.width, cam.height
            ),
            step=state.step + 1,
        )
        return new_state, T.StepAux(loss=loss, psnr=psnr, overflow=overflow)

    step_reg = jax.jit(lambda s, c, i, k: step(s, c, i, k, True))
    step_plain = jax.jit(lambda s, c, i, k: step(s, c, i, k, False))
    densify_fn = jax.jit(
        lambda s, k, it: T.densify_step(s, k, base, it), static_argnums=(2,)
    )

    history = []
    for it in range(1, base.iterations + 1):
        key, k1, k2 = jax.random.split(key, 3)
        ci = int(jax.random.randint(k1, (), 0, n_cams))
        cam = index_camera(cams, ci)
        regularize = it >= cfg.regularize_from
        fn = step_reg if regularize else step_plain
        state, aux = fn(state, cam, images[ci], k2)

        if it == cfg.regularize_from:
            # prune low-opacity gaussians at regularization start
            keep = state.gaussians.opacity >= cfg.prune_opacity_at_reg_start
            state = state.replace(
                gaussians=state.gaussians.replace(
                    active=state.gaussians.active & keep
                )
            )
        if (
            it < base.densify_until_iter
            and it > base.densify_from_iter
            and it % base.densification_interval == 0
            and not regularize
        ):
            # densify_step also zeroes Adam moments of reallocated slots
            # (trainer.py:densify_step), matching the reference optimizer
            # surgery in gaussian_model.py:280-333
            state, _res = densify_fn(state, k2, it)
        if log_every and it % log_every == 0:
            history.append(
                {"iter": it, "loss": float(aux.loss), "psnr": float(aux.psnr)}
            )
    return state, history
