"""Multi-chip sharded training and rendering (shard_map + collectives).

The reference has no distributed execution (SURVEY §2.2); this layer is
new TPU-first design:

- ``dp_train_step``: camera data-parallelism.  Each device renders one
  camera of the batch and computes local gradients; gradients are
  ``psum``-ed over the ``data`` ICI axis; the (replicated) Adam update
  is then identical on every chip.  This parallelizes the dominant cost
  of 3DGS/SuGaR training (rasterizer fwd+bwd).

- ``sharded_render``: Gaussian sharding for scenes larger than one
  chip's HBM.  Splats are partitioned into per-device *depth slabs*
  (by view-space depth quantile); each device rasterizes its slab into
  a full image + transmittance, and the slabs compose front-to-back:
      C = Σ_d C_d · Π_{e<d} T_e,
  which is exact because a depth partition preserves the global
  per-tile depth order (the reference's global sort, rasterizer_impl.cu
  :304-309, restricted to each slab).  The combine is an ``all_gather``
  of D low-resolution image tuples over ICI.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from autovfx_tpu.core.cameras import Camera, index_camera
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.train import trainer as T
from autovfx_tpu.train.densify import DensifyStats, scaled_grad_norm


# ---- camera data-parallel training ----------------------------------------------


def dp_train_step(
    state: T.TrainState,
    cams: Camera,
    images: jax.Array,
    cfg: T.TrainConfig,
    mesh: Mesh,
    axis: str = "data",
):
    """One DP training step over a camera batch of size = mesh[axis].

    cams/images lead with the device-batch dimension.  Returns the new
    (replicated) state and mean aux.
    """

    def per_device(state, cam, img):
        g = state.gaussians
        offset0 = jnp.zeros((g.capacity, 2), jnp.float32)
        params = {f: getattr(g, f) for f in T.PARAM_FIELDS}

        def loss_fn(params, offset):
            g_cur = g.replace(**params)
            cam0 = jax.tree_util.tree_map(lambda x: x[0], cam)
            return T.compute_loss(
                g_cur, offset, cam0, img[0], cfg
            )

        (loss, (radii, overflow, psnr)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset0)
        param_grads, mean2d_grad = grads
        param_grads = jax.lax.pmean(param_grads, axis)
        loss = jax.lax.pmean(loss, axis)
        psnr = jax.lax.pmean(psnr, axis)

        g_new, adam = T.apply_adam(
            g, state.adam, param_grads, state.step, cfg
        )
        # densification stats: D sequential steps over the same cameras
        # would accumulate D per-camera NDC-scaled grad norms and D
        # visibility increments — psum the per-device *norms* and
        # *counts* (not the summed gradient vector), pmax the radii.
        cam0 = jax.tree_util.tree_map(lambda x: x[0], cam)
        gnorm = scaled_grad_norm(mean2d_grad, cam0.width, cam0.height)
        visible = radii > 0
        grad_sum = jax.lax.psum(jnp.where(visible, gnorm, 0.0), axis)
        vis_sum = jax.lax.psum(visible.astype(jnp.float32), axis)
        radii_max = jax.lax.pmax(radii, axis)
        stats = DensifyStats(
            grad_accum=state.stats.grad_accum + grad_sum,
            denom=state.stats.denom + vis_sum,
            max_radii=jnp.maximum(state.stats.max_radii, radii_max),
        )
        new_state = T.TrainState(
            gaussians=g_new, adam=adam, stats=stats, step=state.step + 1
        )
        overflow_any = jax.lax.pmax(overflow.astype(jnp.int32), axis) > 0
        return new_state, T.StepAux(
            loss=loss, psnr=psnr, overflow=overflow_any
        )

    shard = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return shard(state, cams, images)


def dp_train(
    g: Gaussians,
    cams: Camera,
    images: jax.Array,
    cfg: T.TrainConfig,
    mesh: Mesh,
    key: Optional[jax.Array] = None,
    axis: str = "data",
    log_every: int = 0,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
):
    """Full DP training loop: D cameras per optimizer step, with the
    sequential trainer's densify / opacity-reset cadence (train.py:29-188)
    and periodic checkpoints.  Densification and resets run on the
    replicated state OUTSIDE shard_map — identical on every chip, one
    code path shared with ``train/trainer.py`` (no drift)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    d_count = mesh.shape[axis]
    state = T.init_state(g)
    n_cams = images.shape[0]

    step_fn = jax.jit(
        lambda s, cam, img: dp_train_step(s, cam, img, cfg, mesh, axis)
    )
    densify_fn = jax.jit(
        lambda s, k, it: T.densify_step(s, k, cfg, it), static_argnums=(2,)
    )
    reset_fn = jax.jit(T.reset_opacity_step)

    history = []
    for it in range(1, cfg.iterations + 1):
        key, k1, k2 = jax.random.split(key, 3)
        cis = jax.random.randint(k1, (d_count,), 0, n_cams)
        cam_batch = jax.tree_util.tree_map(
            lambda x: x[cis] if getattr(x, "ndim", 0) else x, cams
        )
        state, aux = step_fn(state, cam_batch, images[cis])

        if it < cfg.densify_until_iter:
            if (
                it > cfg.densify_from_iter
                and it % cfg.densification_interval == 0
            ):
                state, _res = densify_fn(state, k2, it)
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


# ---- gaussian-sharded rendering ---------------------------------------------------


def assign_depth_slabs(
    g: Gaussians, cam: Camera, num_slabs: int
) -> jax.Array:
    """(N,) slab index per gaussian by view-depth quantile (approx, via
    sorted sampling).  Inactive gaussians go to slab 0 (they are inert)."""
    from autovfx_tpu.utils.linalg import transform_points

    p_view_z = transform_points(g.xyz, cam.R, cam.t)[:, 2]
    z = jnp.where(g.active, p_view_z, jnp.inf)
    n_act = jnp.maximum(jnp.sum(g.active), 1)
    z_sorted = jnp.sort(z)
    qs = (jnp.arange(1, num_slabs) * n_act) // num_slabs
    bounds = z_sorted[qs]  # (num_slabs-1,)
    slab = jnp.searchsorted(bounds, p_view_z, side="right")
    return jnp.where(g.active, slab, 0).astype(jnp.int32)


def sharded_render(
    g_sharded: Gaussians,
    cam: Camera,
    mesh: Mesh,
    config: RasterConfig = RasterConfig(),
    bg: Optional[jax.Array] = None,
    axis: str = "gauss",
):
    """Render with the splat buffer depth-slab-sharded over ``axis``.

    ``g_sharded`` leads with a device dimension (D, N/D-capacity slabs),
    slab d containing the d-th depth quantile (see assign_depth_slabs +
    shard_gaussians).  Output is the exact composite (replicated).
    """
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    d = mesh.shape[axis]

    def per_device(g_local):
        g0 = jax.tree_util.tree_map(lambda x: x[0], g_local)
        out = rasterize(g0, cam, bg=None, config=config)
        # transmittance of this slab
        trans = 1.0 - out.alpha  # (H, W)
        piece = jnp.stack(
            [
                out.color[..., 0],
                out.color[..., 1],
                out.color[..., 2],
                out.depth,
                trans,
            ],
            axis=0,
        )[None]  # (1, 5, H, W)
        all_pieces = jax.lax.all_gather(
            piece, axis, axis=0, tiled=True
        )  # (D, 5, H, W)
        return all_pieces

    shard = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(),
        check_vma=False,
    )
    pieces = shard(g_sharded)  # (D, 5, H, W) replicated

    color_d = jnp.moveaxis(pieces[:, 0:3], 1, -1)  # (D, H, W, 3)
    depth_d = pieces[:, 3]
    trans_d = pieces[:, 4]
    # front-to-back over-composite across slabs
    t_before = jnp.concatenate(
        [
            jnp.ones_like(trans_d[:1]),
            jnp.cumprod(trans_d, axis=0)[:-1],
        ],
        axis=0,
    )
    color = jnp.sum(color_d * t_before[..., None], axis=0)
    depth = jnp.sum(depth_d * t_before, axis=0)
    t_total = jnp.prod(trans_d, axis=0)
    color = color + t_total[..., None] * bg
    return color, depth, 1.0 - t_total


def shard_gaussians(g: Gaussians, cam: Camera, num_slabs: int) -> Gaussians:
    """Host/jit helper: reorder the splat store into (D, cap_per_slab)
    depth slabs for ``sharded_render`` (capacity-padded per slab).

    NOTE: keeps every slab at FULL capacity (masking only) — exact but
    no memory win.  Use :func:`shard_gaussians_compact` to actually
    reduce per-device memory.
    """
    n = g.capacity
    cap = n  # worst case: all gaussians in one slab — keep full capacity
    slab = assign_depth_slabs(g, cam, num_slabs)

    def build(d):
        keep = (slab == d) & g.active
        return Gaussians(
            xyz=g.xyz,
            sh_dc=g.sh_dc,
            sh_rest=g.sh_rest,
            log_scales=g.log_scales,
            quats=g.quats,
            opacity_logit=g.opacity_logit,
            active=keep,
        )

    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[build(d) for d in range(num_slabs)]
    )


def shard_gaussians_compact(
    g: Gaussians, cam: Camera, num_slabs: int, slack: float = 0.3
):
    """(D, cap)-compacted depth slabs: cap ≈ N/D·(1+slack).

    One argsort groups each slab's members contiguously; each slab then
    gathers a static-size window starting at its offset.  Per-device
    buffers shrink by ~D/(1+slack) versus full capacity — the actual
    "scene larger than one chip's HBM" win.  Returns
    (gaussians (D, cap), overflow ()) — overflow set when a depth
    quantile holds more than cap active splats (increase ``slack``).
    """
    n = g.capacity
    cap = -(-int(n * (1.0 + slack)) // max(num_slabs, 1))
    cap = min(cap, n)
    slab = assign_depth_slabs(g, cam, num_slabs)
    # inactive splats sort to the end of every slab's run
    key = slab * 2 + (~g.active).astype(jnp.int32)
    order = jnp.argsort(key)
    key_sorted = key[order]
    slab_sorted = slab[order]
    counts = jnp.sum(
        jax.nn.one_hot(
            jnp.where(g.active, slab, num_slabs), num_slabs + 1,
            dtype=jnp.int32,
        ),
        axis=0,
    )[:num_slabs]
    # slab d's ACTIVE members start where key 2d first appears
    start_of = jnp.searchsorted(
        key_sorted, jnp.arange(num_slabs) * 2, side="left"
    ).astype(jnp.int32)
    overflow = jnp.any(counts > cap)

    def build(d):
        # dynamic_slice clamps the start near the array end; the slab
        # membership mask keeps the window correct regardless
        idx = jax.lax.dynamic_slice_in_dim(order, start_of[d], cap)
        live = (
            jax.lax.dynamic_slice_in_dim(slab_sorted, start_of[d], cap)
            == d
        )
        return Gaussians(
            xyz=g.xyz[idx],
            sh_dc=g.sh_dc[idx],
            sh_rest=g.sh_rest[idx],
            log_scales=g.log_scales[idx],
            quats=g.quats[idx],
            opacity_logit=g.opacity_logit[idx],
            active=live & g.active[idx],
        )

    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[build(d) for d in range(num_slabs)]
    )
    return stacked, overflow


def sharded_render_compact(
    g_sharded: Gaussians,
    cam: Camera,
    mesh: Mesh,
    config: RasterConfig = RasterConfig(),
    bg: Optional[jax.Array] = None,
    axis: str = "gauss",
):
    """Depth-slab render with a log-step scan composite (no all_gather).

    Each device rasterizes its compacted slab to (premultiplied RGBD,
    transmittance); the front-to-back over-composite is ASSOCIATIVE:
        (A1, T1) ⊕ (A2, T2) = (A1 + T1·A2, T1·T2)
    so a Hillis–Steele inclusive scan over the device ring (log₂ D
    ``ppermute`` hops of one (5, H, W) message each) replaces the
    round-1 ``all_gather`` of D full image stacks — O(log D) traffic
    and O(1) per-device image memory instead of O(D).
    """
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    d_count = mesh.shape[axis]

    def per_device(g_local):
        g0 = jax.tree_util.tree_map(lambda x: x[0], g_local)
        out = rasterize(g0, cam, bg=None, config=config)
        acc = jnp.concatenate(
            [
                jnp.moveaxis(out.color, -1, 0),
                out.depth[None],
            ],
            axis=0,
        )  # (4, H, W) premultiplied slab contribution
        trans = 1.0 - out.alpha  # (H, W)

        me = jax.lax.axis_index(axis)
        step = 1
        while step < d_count:
            # pull the inclusive prefix of the device `step` positions
            # in FRONT of me (lower slab index = nearer the camera)
            perm = [
                (src, src + step)
                for src in range(d_count - step)
            ]
            acc_in = jax.lax.ppermute(acc, axis, perm)
            trans_in = jax.lax.ppermute(trans, axis, perm)
            has_in = me >= step
            # (front ⊕ mine): front acc + front trans · mine
            acc = jnp.where(has_in, acc_in + trans_in * acc, acc)
            trans = jnp.where(has_in, trans_in * trans, trans)
            step *= 2
        # device D-1 now holds the full composite; broadcast it
        is_last = (me == d_count - 1).astype(acc.dtype)
        acc = jax.lax.psum(acc * is_last, axis)
        trans = jax.lax.psum(trans * is_last, axis)
        return acc[None], trans[None]

    shard = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    accs, transs = shard(g_sharded)
    acc = accs[0]
    t_total = transs[0]
    color = jnp.moveaxis(acc[0:3], 0, -1) + t_total[..., None] * bg
    return color, acc[3], 1.0 - t_total
