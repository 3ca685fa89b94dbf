"""Independent numpy MLS-MPM oracle (per-particle loops, no JAX).

The test fixture the reference lacks (SURVEY.md section 4): a direct, slow,
obviously-correct transcription of the MPM math used to validate the
vectorized JAX pipeline, mirroring the reference's GPU-vs-CPU prefix-sum
oracle pattern (/root/reference/src/grid/prefix_sum.rs:71-83).

Covers the collider-free path: P2G -> grid update -> G2P -> particle update
with corotated elasticity and optional Drucker-Prager plasticity.
"""

import numpy as np


def eval_all(x):
    return np.array(
        [0.5 * (1.5 - x) ** 2, 0.75 - (x - 1.0) ** 2, 0.5 * (x - 0.5) ** 2]
    )


def signed_svd(f):
    u, s, vt = np.linalg.svd(f)
    if np.linalg.det(u) < 0:
        u[:, -1] *= -1
        s[-1] *= -1
    if np.linalg.det(vt) < 0:
        vt[-1, :] *= -1
        s[-1] *= -1
    return u, s, vt


def corotated_stress(lam, mu, f):
    u, s, vt = signed_svd(f)
    j = np.prod(s)
    shifted = u @ np.diag(s - 1.0) @ vt
    return 2.0 * mu * (shifted @ f.T) + lam * (j - 1.0) * j * np.eye(f.shape[0])


def dp_project(h0, h1, h2, h3, lam, mu, state, f):
    """Drucker-Prager return map; state = [det, hardening, log_vol_gain]."""
    if lam <= 0.0:
        return state, f
    d = f.shape[0]
    u, s, vt = signed_svd(f)
    q = state[1]
    angle = h0 + (h1 * q - h3) * np.exp(-h2 * q)
    sa = np.sin(angle)
    alpha = np.sqrt(2.0 / 3.0) * 2.0 * sa / (3.0 - sa)

    strain = np.log(np.maximum(s, 1e-12)) + state[2] / d
    trace = strain.sum()
    dev = strain - trace / d
    dev_norm = np.linalg.norm(dev)
    if trace > 0.0 or dev_norm == 0.0:
        new_s = np.ones(d)
        hard = np.linalg.norm(strain)
    else:
        gamma = dev_norm + (d * lam + 2.0 * mu) / (2.0 * mu) * trace * alpha
        if gamma <= 0.0:
            return state, f
        hcorr = strain - dev * (gamma / dev_norm)
        new_s = np.exp(hcorr)
        hard = gamma
    prev_det = np.prod(s)
    new_det = np.prod(new_s)
    new_state = np.array(
        [
            state[0] * prev_det / new_det,
            state[1] + hard,
            state[2] + np.log(max(prev_det, 1e-20)) - np.log(max(new_det, 1e-20)),
        ]
    )
    return new_state, u @ np.diag(new_s) @ vt


class OracleSim:
    """Tiny dense-grid MPM simulator; grid covers cells [origin, origin+shape)."""

    def __init__(self, pos, vel, mass, vol0, lam, mu, cell_width, origin, shape,
                 dp=None, phase=None, max_stretch=None):
        self.p = np.array(pos, np.float64)
        self.v = np.array(vel, np.float64)
        self.m = np.array(mass, np.float64)
        self.vol0 = np.array(vol0, np.float64)
        self.lam = np.array(lam, np.float64)
        self.mu = np.array(mu, np.float64)
        n, d = self.p.shape
        self.F = np.tile(np.eye(d), (n, 1, 1))
        self.affine = np.zeros((n, d, d))
        self.h = cell_width
        self.origin = np.array(origin, np.int64)
        self.shape = tuple(shape)
        self.dim = d
        self.dp = dp  # dict of arrays h0..h3, lam, mu or None
        self.dp_state = np.tile(np.array([1.0, 1.0, 0.0]), (n, 1))
        self.phase = np.zeros(n) if phase is None else np.array(phase, np.float64)
        self.max_stretch = (
            -np.ones(n) if max_stretch is None else np.array(max_stretch, np.float64)
        )

    def _offsets(self):
        d = self.dim
        return np.stack(
            np.meshgrid(*([np.arange(3)] * d), indexing="ij"), -1
        ).reshape(-1, d)

    def step(self, dt, gravity):
        h = self.h
        d = self.dim
        inv_d = 4.0 / (h * h)
        grav = np.asarray(gravity, np.float64)
        offs = self._offsets()
        mom = np.zeros(self.shape + (d,))
        mass = np.zeros(self.shape)

        # P2G
        for i in range(len(self.p)):
            base = np.round(self.p[i] / h).astype(np.int64) - 1
            x = self.p[i] / h - base
            waxis = np.stack([eval_all(x[a]) for a in range(d)])
            for o in offs:
                cell = base + o
                idx = tuple(cell - self.origin)
                if any(j < 0 or j >= s for j, s in zip(idx, self.shape)):
                    continue
                w = np.prod([waxis[a, o[a]] for a in range(d)])
                dpt = cell * h - self.p[i]
                mom[idx] += w * (self.affine[i] @ dpt + self.m[i] * self.v[i])
                mass[idx] += w * self.m[i]

        # Grid update
        vel = np.zeros_like(mom)
        nz = mass > 0
        vel[nz] = (mom[nz] + mass[nz, None] * grav * dt) / mass[nz, None]
        np.clip(vel, -h / dt, h / dt, out=vel)

        # G2P + particle update
        for i in range(len(self.p)):
            base = np.round(self.p[i] / h).astype(np.int64) - 1
            x = self.p[i] / h - base
            waxis = np.stack([eval_all(x[a]) for a in range(d)])
            v_new = np.zeros(d)
            grad = np.zeros((d, d))
            for o in offs:
                cell = base + o
                idx = tuple(cell - self.origin)
                if any(j < 0 or j >= s for j, s in zip(idx, self.shape)):
                    continue
                w = np.prod([waxis[a, o[a]] for a in range(d)])
                dpt = cell * h - self.p[i]
                v_new += w * vel[idx]
                grad += w * inv_d * np.outer(vel[idx], dpt)

            speed = np.linalg.norm(v_new)
            if speed > h / dt:
                v_new *= (h / dt) / speed
            self.p[i] = self.p[i] + v_new * dt
            self.v[i] = v_new
            newF = self.F[i] + dt * grad @ self.F[i]

            if self.phase[i] > 0.0 and self.max_stretch[i] > 0.0:
                _, s, _ = signed_svd(newF)
                if np.any(s > self.max_stretch[i]):
                    self.phase[i] = 0.0
            if self.phase[i] == 0.0 and self.dp is not None:
                self.dp_state[i], newF = dp_project(
                    self.dp["h0"][i], self.dp["h1"][i], self.dp["h2"][i],
                    self.dp["h3"][i], self.dp["lam"][i], self.dp["mu"][i],
                    self.dp_state[i], newF,
                )
            self.F[i] = newF
            stress = corotated_stress(self.lam[i], self.mu[i], newF)
            self.affine[i] = grad * self.m[i] - stress * (
                self.vol0[i] * inv_d * dt
            )
