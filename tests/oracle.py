"""Brute-force numpy oracle replicating the CUDA rasterizer loop exactly.

Mirrors forward.cu renderCUDA semantics (per tile: index-order stable
depth sort, sequential front-to-back blend with skip rules and the
test_T < 1e-4 done flag) in slow, obviously-correct Python.  Used to
validate the vectorized/segmented JAX implementation.
"""
import numpy as np

TILE = 16
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def oracle_render(splats, width, height, bg):
    """splats: Splats2D (numpy-converted). Returns color/depth/alpha (H,W)."""
    mean2d = np.asarray(splats.mean2d, np.float64)
    conic = np.asarray(splats.conic, np.float64)
    color = np.asarray(splats.color, np.float64)
    opacity = np.asarray(splats.opacity, np.float64)
    depth = np.asarray(splats.depth, np.float64)
    tmin = np.asarray(splats.tile_min)
    tmax = np.asarray(splats.tile_max)
    touched = np.asarray(splats.tiles_touched)

    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    out_c = np.zeros((height, width, 3))
    out_d = np.zeros((height, width))
    out_a = np.zeros((height, width))

    for ty in range(tiles_y):
        for tx in range(tiles_x):
            covers = (
                (touched > 0)
                & (tmin[:, 0] <= tx)
                & (tx < tmax[:, 0])
                & (tmin[:, 1] <= ty)
                & (ty < tmax[:, 1])
            )
            ids = np.nonzero(covers)[0]
            ids = ids[np.argsort(depth[ids], kind="stable")]
            for pyy in range(ty * TILE, min((ty + 1) * TILE, height)):
                for pxx in range(tx * TILE, min((tx + 1) * TILE, width)):
                    T = 1.0
                    C = np.zeros(3)
                    D = 0.0
                    for i in ids:
                        dx = mean2d[i, 0] - pxx
                        dy = mean2d[i, 1] - pyy
                        power = (
                            -0.5
                            * (conic[i, 0] * dx * dx + conic[i, 2] * dy * dy)
                            - conic[i, 1] * dx * dy
                        )
                        if power > 0.0:
                            continue
                        alpha = min(ALPHA_MAX, opacity[i] * np.exp(power))
                        if alpha < ALPHA_MIN:
                            continue
                        test_T = T * (1 - alpha)
                        if test_T < T_EPS:
                            break  # done flag
                        C += color[i] * alpha * T
                        D += depth[i] * alpha * T
                        T = test_T
                    out_c[pyy, pxx] = C + T * np.asarray(bg)
                    out_d[pyy, pxx] = D
                    out_a[pyy, pxx] = 1.0 - T
    return out_c, out_d, out_a
