"""Generate committed physics trajectory goldens from an INDEPENDENT
sequential-impulse (Gauss-Seidel PGS) reference solver.

Provenance
----------
pybullet is not installable in this environment, so the goldens are not
raw Bullet output.  Instead this script implements Bullet's
btSequentialImpulseConstraintSolver algorithm *sequentially* (one
contact at a time, immediate velocity update — the part of Bullet the
production solver deliberately changes to batched Jacobi sweeps for
TPU) in float64 numpy, with the exact Bullet configuration AutoVFX uses
(``/root/reference/blender/all_rendering.py:794-818``): restitution
0.6, collision margin 1e-3, friction 0.5, gravity (0,0,-9.81), 60
substeps/s (fps 15 x 4), 10 solver iterations, split-impulse position
correction, Bullet deactivation thresholds (lin 0.4 / ang 0.5, ~0.5 s).

The production solver (autovfx_tpu/physics/solver.py) shares the model
*specification* (it targets the same Bullet config) but none of the
implementation: contacts here are analytic plane/hull-plane tests in
f64, impulses are strictly sequential, there is no Jacobi mass
splitting and no uniform-grid mesh query.  Agreement between the two is
therefore evidence that the TPU solver's batching and contact pipeline
reproduce sequential-PGS trajectories, which is the "matching physics
trajectories" claim of BASELINE.md turned into a number
(tests/test_physics_golden.py asserts the bounds).

Run:  python scripts/gen_physics_goldens.py   (writes tests/golden/)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FPS = 15.0
SUBSTEPS = 4
DT = 1.0 / (FPS * SUBSTEPS)
GRAVITY = np.array([0.0, 0.0, -9.81])
MARGIN = 1e-3
SPECULATIVE = 0.05
ITERS = 10
BAUMGARTE = 0.2
SLOP = 1e-3
REST_THRESHOLD = 0.5
SLEEP_LIN, SLEEP_ANG, SLEEP_SUBSTEPS = 0.4, 0.5, 30
WAKE_SPEED = 0.5
FRICTION = 0.5
SCENE_RESTITUTION = 0.6


def quat_to_rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_integrate(q, w, dt):
    dq = 0.5 * dt * np.array([
        -q[1] * w[0] - q[2] * w[1] - q[3] * w[2],
        q[0] * w[0] + q[2] * w[2] - q[3] * w[1],
        q[0] * w[1] + q[3] * w[0] - q[1] * w[2],
        q[0] * w[2] + q[1] * w[1] - q[2] * w[0],
    ])
    q = q + dq
    return q / np.linalg.norm(q)


class Body:
    def __init__(self, half, pos, quat=None, mass=1.0, restitution=0.6):
        self.half = np.asarray(half, np.float64)
        self.pos = np.asarray(pos, np.float64)
        self.quat = np.array([1.0, 0, 0, 0]) if quat is None else np.asarray(quat, np.float64)
        self.v = np.zeros(3)
        self.w = np.zeros(3)
        self.mass = mass
        self.inv_mass = 1.0 / mass
        hx, hy, hz = self.half
        # solid box inertia (unit density scaled by mass)
        self.I_body = mass / 3.0 * np.diag(
            [hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy]
        )
        self.restitution = restitution
        self.asleep = False
        self.low_count = 0

    def corners(self):
        R = quat_to_rotmat(self.quat)
        signs = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
             for sz in (-1, 1)], np.float64
        )
        return self.pos + (signs * self.half) @ R.T

    def inv_inertia_world(self):
        R = quat_to_rotmat(self.quat)
        return R @ np.linalg.inv(self.I_body) @ R.T

    def planes(self):
        """Hull planes (n, d) with n·x <= d inside, world frame."""
        R = quat_to_rotmat(self.quat)
        ns, ds = [], []
        for axis in range(3):
            for sign in (-1.0, 1.0):
                n = sign * R[:, axis]
                d = n @ self.pos + self.half[axis]
                ns.append(n)
                ds.append(d)
        return np.array(ns), np.array(ds)


class Contact:
    def __init__(self, a, b, point, normal, depth):
        self.a = a          # body index receiving +normal impulse
        self.b = b          # body index or -1 for the static ground
        self.point = point
        self.normal = normal
        self.depth = depth  # margin - dist (>0 touching within margin)


def gen_contacts(bodies):
    contacts = []
    for i, body in enumerate(bodies):
        if body.asleep:
            continue
        # ground plane z = 0
        for c in body.corners():
            dist = c[2]
            if dist < MARGIN + SPECULATIVE:
                contacts.append(
                    Contact(i, -1, c.copy(), np.array([0.0, 0, 1.0]),
                            MARGIN - dist)
                )
        # other hulls: vertex of i vs planes of j (both orders appear
        # as (i, j) iterates over ordered pairs)
        for j, other in enumerate(bodies):
            if j == i:
                continue
            if body.asleep and other.asleep:
                continue
            ns, ds = other.planes()
            for c in body.corners():
                sd = (ns @ c - ds)  # signed distance to each face plane
                kmax = int(np.argmax(sd))
                dist = sd[kmax]
                if dist < MARGIN + SPECULATIVE:
                    contacts.append(
                        Contact(i, j, c.copy(), ns[kmax].copy(),
                                MARGIN - dist)
                    )
    return contacts


def rel_vel(bodies, c):
    ba = bodies[c.a]
    va = ba.v + np.cross(ba.w, c.point - ba.pos)
    if c.b < 0:
        return va
    bb = bodies[c.b]
    return va - (bb.v + np.cross(bb.w, c.point - bb.pos))


def substep(bodies):
    for b in bodies:
        if not b.asleep:
            b.v = b.v + DT * GRAVITY

    contacts = gen_contacts(bodies)

    # pre-solve targets (Bullet: restitution from approach speed)
    for c in contacts:
        vn0 = rel_vel(bodies, c) @ c.normal
        rest = bodies[c.a].restitution * (
            SCENE_RESTITUTION if c.b < 0 else bodies[c.b].restitution
        )
        bounce = -rest * vn0 if -vn0 > REST_THRESHOLD else 0.0
        gap = max(-c.depth, 0.0)
        c.target = bounce if bounce > 0.0 else -gap / DT
        # effective masses
        ia = bodies[c.a].inv_inertia_world()
        ra = c.point - bodies[c.a].pos
        if c.b >= 0:
            ib = bodies[c.b].inv_inertia_world()
            rb = c.point - bodies[c.b].pos
        t1 = np.cross(
            c.normal,
            np.array([0.0, 0, 1.0]) if abs(c.normal[2]) < 0.9
            else np.array([1.0, 0, 0.0]),
        )
        t1 /= max(np.linalg.norm(t1), 1e-9)
        c.t1, c.t2 = t1, np.cross(c.normal, t1)

        def keff(axis):
            ta = np.cross(ra, axis)
            k = bodies[c.a].inv_mass + ta @ ia @ ta
            if c.b >= 0:
                tb = np.cross(rb, axis)
                k += bodies[c.b].inv_mass + tb @ ib @ tb
            return max(k, 1e-9)

        c.kn = keff(c.normal)
        c.kt1 = keff(c.t1)
        c.kt2 = keff(c.t2)
        c.pn = c.pt1 = c.pt2 = 0.0

    # sequential Gauss-Seidel impulse iterations (the Bullet way)
    for _ in range(ITERS):
        for c in contacts:
            v = rel_vel(bodies, c)
            vn = v @ c.normal
            dpn = (c.target - vn) / c.kn
            pn_new = max(c.pn + dpn, 0.0)
            dpn = pn_new - c.pn
            c.pn = pn_new

            vt1, vt2 = v @ c.t1, v @ c.t2
            max_f = FRICTION * c.pn
            pt1_new = np.clip(c.pt1 - vt1 / c.kt1, -max_f, max_f)
            pt2_new = np.clip(c.pt2 - vt2 / c.kt2, -max_f, max_f)
            dpt1, dpt2 = pt1_new - c.pt1, pt2_new - c.pt2
            c.pt1, c.pt2 = pt1_new, pt2_new

            imp = dpn * c.normal + dpt1 * c.t1 + dpt2 * c.t2
            ba = bodies[c.a]
            if not ba.asleep:
                ba.v = ba.v + imp * ba.inv_mass
                ba.w = ba.w + ba.inv_inertia_world() @ np.cross(
                    c.point - ba.pos, imp
                )
            if c.b >= 0:
                bb = bodies[c.b]
                if not bb.asleep:
                    bb.v = bb.v - imp * bb.inv_mass
                    bb.w = bb.w - bb.inv_inertia_world() @ np.cross(
                        c.point - bb.pos, imp
                    )

    # split-impulse position correction (linear pseudo-impulses)
    dpos = {i: np.zeros(3) for i in range(len(bodies))}
    for _ in range(4):
        for c in contacts:
            sep = (dpos[c.a] - (dpos[c.b] if c.b >= 0 else 0.0)) @ c.normal
            depth_now = c.depth - sep
            k = bodies[c.a].inv_mass + (
                bodies[c.b].inv_mass if c.b >= 0 else 0.0
            )
            p = BAUMGARTE * max(depth_now - SLOP, 0.0) / max(k, 1e-9)
            dpos[c.a] = dpos[c.a] + 0.7 * p * c.normal * bodies[c.a].inv_mass
            if c.b >= 0:
                dpos[c.b] = dpos[c.b] - 0.7 * p * c.normal * bodies[c.b].inv_mass
    for i, b in enumerate(bodies):
        if not b.asleep:
            b.pos = b.pos + dpos[i]

    # Bullet-style deactivation
    wake = set()
    for c in contacts:
        vn_now = abs(rel_vel(bodies, c) @ c.normal)
        if vn_now > WAKE_SPEED:
            wake.add(c.a)
            if c.b >= 0:
                wake.add(c.b)
    for i, b in enumerate(bodies):
        low = (
            np.linalg.norm(b.v) < SLEEP_LIN
            and np.linalg.norm(b.w) < SLEEP_ANG
        )
        b.low_count = b.low_count + 1 if (low and i not in wake) else 0
        b.asleep = (b.asleep and i not in wake) or (
            b.low_count >= SLEEP_SUBSTEPS
        )
        if b.asleep:
            b.v[:] = 0.0
            b.w[:] = 0.0

    # integrate (semi-implicit Euler, matching the production order)
    for b in bodies:
        if not b.asleep:
            b.pos = b.pos + DT * b.v
            b.quat = quat_integrate(b.quat, b.w, DT)


def run(bodies, frames):
    pos = np.zeros((frames, len(bodies), 3))
    quat = np.zeros((frames, len(bodies), 4))
    for f in range(frames):
        for _ in range(SUBSTEPS):
            substep(bodies)
        for i, b in enumerate(bodies):
            pos[f, i] = b.pos
            quat[f, i] = b.quat
    return pos, quat


def roty(deg):
    a = np.deg2rad(deg)
    return np.array([np.cos(a / 2), 0.0, np.sin(a / 2), 0.0])


def _with_v(bodies, v):
    bodies[0].v = np.asarray(v, np.float64)
    return bodies


SCENES = {
    # straight drop onto the ground, restitution bounce (symmetric —
    # the cleanest falsifier for restitution/threshold semantics)
    "drop": lambda: [Body([0.3, 0.3, 0.3], [0.0, 0.0, 1.5])],
    # slightly tilted cube with lateral speed: edge impact + friction.
    # Kept mild (15 deg, low drop) — steeper tilts tip into chaotic
    # edge-bounce regimes where no two solvers agree.
    "tumble": lambda: _with_v(
        [Body([0.3, 0.3, 0.3], [0.0, 0.0, 0.8], quat=roty(15.0))],
        [0.3, 0.0, 0.0],
    ),
    # two-cube stack settling — the Jacobi-vs-sequential stress case.
    # The top starts 2 mm above contact so the impact stays below the
    # 0.5 m/s restitution threshold (a bouncing stack is chaotic), and
    # it is smaller (0.25 vs 0.3) with its corners strictly inside the
    # bottom's footprint: vertex-argmax contact generation (shared with
    # the production solver) degenerates when a vertex lies exactly on
    # a neighboring face plane.
    "stack": lambda: [
        Body([0.3, 0.3, 0.3], [0.0, 0.0, 0.301 + MARGIN]),
        Body([0.25, 0.25, 0.25], [0.03, 0.0, 0.854]),
    ],
}

if __name__ == "__main__":
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden",
    )
    os.makedirs(out_dir, exist_ok=True)
    frames = 45  # 3 s at fps 15
    for name, make in SCENES.items():
        bodies = make()
        init_pos = np.stack([b.pos for b in bodies])
        init_quat = np.stack([b.quat for b in bodies])
        half = np.stack([b.half for b in bodies])
        rest = np.array([b.restitution for b in bodies])
        init_v = np.stack([b.v for b in bodies])
        pos, quat = run(bodies, frames)
        path = os.path.join(out_dir, f"physics_{name}.npz")
        np.savez_compressed(
            path,
            pos=pos.astype(np.float32),
            quat=quat.astype(np.float32),
            init_pos=init_pos.astype(np.float32),
            init_quat=init_quat.astype(np.float32),
            init_v=init_v.astype(np.float32),
            half=half.astype(np.float32),
            restitution=rest.astype(np.float32),
            fps=FPS,
            substeps=SUBSTEPS,
            provenance=(
                "sequential-PGS Bullet-algorithm reference "
                "(scripts/gen_physics_goldens.py), config "
                "all_rendering.py:794-818"
            ),
        )
        print(f"{name}: final pos {pos[-1].round(4).tolist()} -> {path}")
