"""Independent numpy CPIC oracle: OracleSim + analytic cuboid colliders.

Extends tests/oracle_mpm.py with the full CPIC chain, transcribed directly
from the reference WGSL semantics (NOT from the JAX implementation):

  node CDF (collide.wgsl:23-56) -> particle affinity/sign votes + MLS
  reconstruction (g2p_cdf.wgsl:157-249) -> P2G compatibility masking +
  ghost-velocity impulses (p2g.wgsl:200-236) -> G2P ghost substitution +
  rigid contact velocity (g2p.wgsl:184-226) -> particle contact projection
  and penalty (particle_update.wgsl:64-84) -> body impulse application,
  velocity caps and pose integration (rigid_impulses.wgsl:94-137).

Per-particle / per-node python loops in float64 — slow and obviously
correct.  `sign_vote_bug=True` deliberately inverts the sign vote (the subtlest
bit-logic in g2p_cdf.wgsl:178-188) so the test can prove the comparison
catches such a bug.
"""

import numpy as np

from oracle_mpm import OracleSim, eval_all

FRICTION = 20.0
PENALTY = 1.0e3


def quat_rotate(q, v):
    w, x, y, z = q
    u = np.array([x, y, z])
    return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)


def quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def quat_from_scaled_axis(v):
    angle = np.linalg.norm(v)
    if angle < 1e-12:
        return np.array([1.0, 0.5 * v[0], 0.5 * v[1], 0.5 * v[2]])
    axis = v / angle
    h = 0.5 * angle
    return np.concatenate([[np.cos(h)], np.sin(h) * axis])


def quat_to_matrix(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class Body:
    """One cuboid body slot (fixed / kinematic / dynamic)."""

    def __init__(self, half_extents, pos, linvel=None, angvel=None,
                 density=None):
        self.he = np.asarray(half_extents, np.float64)
        self.pos = np.asarray(pos, np.float64)
        self.rot = np.array([1.0, 0.0, 0.0, 0.0])
        self.linvel = np.zeros(3) if linvel is None else np.asarray(linvel, np.float64)
        self.angvel = np.zeros(3) if angvel is None else np.asarray(angvel, np.float64)
        if density is None:
            self.inv_mass = np.zeros(3)
            self.inv_inertia_local = np.zeros((3, 3))
        else:
            vol = float(np.prod(2 * self.he))
            mass = density * vol
            ex, ey, ez = 2 * self.he
            inertia = mass / 12.0 * np.array(
                [ey**2 + ez**2, ex**2 + ez**2, ex**2 + ey**2]
            )
            self.inv_mass = np.full(3, 1.0 / mass)
            self.inv_inertia_local = np.diag(1.0 / inertia)
        self.world_com = self.pos.copy()
        self.inv_inertia_world = self.inv_inertia_local.copy()

    def update_mprops(self):
        # local_com = 0 for cuboids here.
        self.world_com = self.pos.copy()
        r = quat_to_matrix(self.rot)
        self.inv_inertia_world = r @ self.inv_inertia_local @ r.T

    def project(self, p):
        """(dpt = closest boundary point - p in world, inside)."""
        rm = quat_to_matrix(self.rot)
        q = rm.T @ (p - self.pos)
        inside = bool(np.all(np.abs(q) < self.he))
        if inside:
            gap = self.he - np.abs(q)
            ax = int(np.argmin(gap))
            proj = q.copy()
            s = np.sign(q[ax])
            proj[ax] = (s if s != 0 else 1.0) * self.he[ax]
        else:
            proj = np.clip(q, -self.he, self.he)
        world = rm @ proj + self.pos
        return world - p, inside

    def velocity_at(self, p):
        return self.linvel + np.cross(self.angvel, p - self.world_com)


def project_velocity(vel, normal):
    nv = float(vel @ normal)
    tang = vel - normal * nv
    tl = np.linalg.norm(tang)
    if nv < 0.0:
        tdir = tang / tl if tl > 1e-8 else np.zeros(3)
        return tdir * max(0.0, tl + FRICTION * nv)
    return vel


class OracleCpic(OracleSim):
    """OracleSim + CPIC against analytic cuboid bodies (3D)."""

    def __init__(self, *args, bodies=(), sign_vote_bug=False, **kw):
        super().__init__(*args, **kw)
        self.bodies = list(bodies)
        self.aff = np.zeros(len(self.p), np.uint32)
        self.sd = np.zeros(len(self.p))
        self.normal = np.zeros((len(self.p), 3))
        self.sign_vote_bug = sign_vote_bug

    # ------------------------------------------------------------- node CDF
    def node_cdf(self):
        shape = self.shape
        nd = np.full(shape, 1e10)
        na = np.zeros(shape, np.uint32)
        ncl = np.full(shape, -1, np.int64)
        cap = 1.5 * self.h
        for idx in np.ndindex(*shape):
            xp = (np.array(idx) + self.origin) * self.h
            for b, body in enumerate(self.bodies):
                dpt, inside = body.project(xp)
                within = inside or np.all(np.abs(dpt) <= cap)
                if not within:
                    continue
                di = np.linalg.norm(dpt)
                if di < nd[idx]:
                    nd[idx] = di
                    ncl[idx] = b
                bits = (0x00010001 << b) if inside else (1 << b)
                na[idx] = na[idx] | np.uint32(bits)
        return nd, na, ncl

    # --------------------------------------------------------- particle CDF
    def particle_cdf(self, nd, na):
        h = self.h
        offs = self._offsets()
        nb = len(self.bodies)
        for i in range(len(self.p)):
            base = np.round(self.p[i] / h).astype(np.int64) - 1
            x = self.p[i] / h - base
            waxis = np.stack([eval_all(x[a]) for a in range(3)])
            bits = 0
            votes = np.zeros(nb)
            nodes = []
            for o in offs:
                cell = base + o
                idx = tuple(cell - self.origin)
                if any(j < 0 or j >= s for j, s in zip(idx, self.shape)):
                    continue
                w = float(np.prod([waxis[a, o[a]] for a in range(3)]))
                a_n = int(na[idx])
                nodes.append((cell, w, a_n, float(nd[idx])))
                bits |= a_n & 0xFFFF
                for c in range(nb):
                    if a_n & (1 << c):
                        sgn = -1.0 if a_n & (1 << (16 + c)) else 1.0
                        votes[c] += sgn * w * nd[idx]
            prev = int(self.aff[i])
            sign_word = 0
            for c in range(nb):
                if prev & (1 << c):
                    s_bit = (prev >> (16 + c)) & 1
                elif self.sign_vote_bug:
                    s_bit = 1 if votes[c] > 0.0 else 0   # inverted vote
                else:
                    s_bit = 1 if votes[c] < 0.0 else 0
                sign_word |= s_bit << (16 + c)
            p_aff = bits | sign_word

            # MLS over nodes sharing affinity.
            qtq = np.zeros((4, 4))
            qtu = np.zeros(4)
            for cell, w, a_n, dist in nodes:
                common = a_n & p_aff & 0xFFFF
                if not common:
                    continue
                sdist = dist
                if ((a_n ^ p_aff) >> 16) & common:
                    sdist = -dist
                dpt = cell * h - self.p[i]
                pv = np.array([dpt[0], dpt[1], dpt[2], 1.0])
                qtq += w * np.outer(pv, pv)
                qtu += w * sdist * pv
            det = np.linalg.det(qtq)
            if det > 1e-8:
                sol = np.linalg.solve(qtq, qtu)
                nl = np.linalg.norm(sol[:3])
                self.normal[i] = sol[:3] / nl if nl > 1e-6 else 0.0
                self.sd[i] = sol[3]
                self.aff[i] = np.uint32(p_aff)
            else:
                self.normal[i] = 0.0
                self.sd[i] = 0.0
                self.aff[i] = np.uint32(0)

    # --------------------------------------------------------------- substep
    def step(self, dt, gravity):
        for body in self.bodies:
            body.update_mprops()
        nd, na, ncl = self.node_cdf()
        self.particle_cdf(nd, na)

        h = self.h
        d = 3
        inv_d = 4.0 / (h * h)
        grav = np.asarray(gravity, np.float64)
        offs = self._offsets()
        mom = np.zeros(self.shape + (d,))
        mass = np.zeros(self.shape)
        nb = len(self.bodies)
        lin_imp = np.zeros((nb, 3))
        ang_imp = np.zeros((nb, 3))

        def compatible(a_n, a_p):
            common = a_n & a_p & 0xFFFF
            return ((a_n >> 16) & common) == ((a_p >> 16) & common)

        # P2G + impulses
        for i in range(len(self.p)):
            base = np.round(self.p[i] / h).astype(np.int64) - 1
            x = self.p[i] / h - base
            waxis = np.stack([eval_all(x[a]) for a in range(3)])
            for o in offs:
                cell = base + o
                idx = tuple(cell - self.origin)
                if any(j < 0 or j >= s for j, s in zip(idx, self.shape)):
                    continue
                w = float(np.prod([waxis[a, o[a]] for a in range(3)]))
                if compatible(int(na[idx]), int(self.aff[i])):
                    dpt = cell * h - self.p[i]
                    mom[idx] += w * (self.affine[i] @ dpt + self.m[i] * self.v[i])
                    mass[idx] += w * self.m[i]
                elif ncl[idx] >= 0:
                    b = int(ncl[idx])
                    body = self.bodies[b]
                    xp = cell * h
                    bv = body.velocity_at(xp)
                    ghost = bv + project_velocity(self.v[i] - bv, self.normal[i])
                    dimp = (self.v[i] - ghost) * w * self.m[i]
                    lin_imp[b] += dimp
                    ang_imp[b] += np.cross(dimp, body.world_com - xp)

        # Grid update
        vel = np.zeros_like(mom)
        nz = mass > 0
        vel[nz] = (mom[nz] + mass[nz, None] * grav * dt) / mass[nz, None]
        np.clip(vel, -h / dt, h / dt, out=vel)

        # G2P + particle update
        for i in range(len(self.p)):
            base = np.round(self.p[i] / h).astype(np.int64) - 1
            x = self.p[i] / h - base
            waxis = np.stack([eval_all(x[a]) for a in range(3)])
            v_new = np.zeros(d)
            grad = np.zeros((d, d))
            for o in offs:
                cell = base + o
                idx = tuple(cell - self.origin)
                if any(j < 0 or j >= s for j, s in zip(idx, self.shape)):
                    continue
                w = float(np.prod([waxis[a, o[a]] for a in range(3)]))
                dpt = cell * h - self.p[i]
                if compatible(int(na[idx]), int(self.aff[i])):
                    veff = vel[idx]
                elif ncl[idx] >= 0:
                    body = self.bodies[int(ncl[idx])]
                    bv = body.velocity_at(cell * h)
                    veff = bv + project_velocity(self.v[i] - bv, self.normal[i])
                else:
                    veff = self.v[i]
                v_new += w * veff
                grad += w * inv_d * np.outer(veff, dpt)

            # Rigid contact velocity (sum over affine bodies).
            rv = np.zeros(3)
            for b in range(nb):
                if int(self.aff[i]) & (1 << b):
                    rv += self.bodies[b].velocity_at(self.p[i])

            # Contact projection + clamp + advect + penalty
            # (particle_update.wgsl:64-84).
            penetrating = self.sd[i] < -0.05 * h
            if penetrating:
                v_new = rv + project_velocity(v_new - rv, self.normal[i])
            speed = np.linalg.norm(v_new)
            if speed > h / dt:
                v_new *= (h / dt) / speed
            self.p[i] = self.p[i] + v_new * dt
            if penetrating:
                corrected = max(self.sd[i], -0.3 * h)
                v_new = v_new + dt * -corrected * PENALTY * self.normal[i]
            self.v[i] = v_new

            newF = self.F[i] + dt * grad @ self.F[i]
            if self.phase[i] > 0.0 and self.max_stretch[i] > 0.0:
                from oracle_mpm import signed_svd

                _, s, _ = signed_svd(newF)
                if np.any(s > self.max_stretch[i]):
                    self.phase[i] = 0.0
            if self.phase[i] == 0.0 and self.dp is not None:
                from oracle_mpm import dp_project

                self.dp_state[i], newF = dp_project(
                    self.dp["h0"][i], self.dp["h1"][i], self.dp["h2"][i],
                    self.dp["h3"][i], self.dp["lam"][i], self.dp["mu"][i],
                    self.dp_state[i], newF,
                )
            self.F[i] = newF
            from oracle_mpm import corotated_stress

            stress = corotated_stress(self.lam[i], self.mu[i], newF)
            self.affine[i] = grad * self.m[i] - stress * (
                self.vol0[i] * inv_d * dt
            )

        # Body impulse application + caps + pose integration + gravity
        # (pipeline.rigid_bodies_update order).
        for b, body in enumerate(self.bodies):
            new_lin = body.linvel + lin_imp[b] * body.inv_mass
            new_ang = body.angvel + body.inv_inertia_world @ ang_imp[b]
            nonzero = np.linalg.norm(lin_imp[b]) != 0 or np.linalg.norm(ang_imp[b]) != 0
            lin_limit = 0.1 * h / dt
            ln = np.linalg.norm(new_lin)
            an = np.linalg.norm(new_ang)
            if nonzero and ln > lin_limit:
                new_lin = new_lin * (lin_limit / ln)
            if nonzero and an > 1.0:
                new_ang = new_ang * (1.0 / an)
            # integrate about COM (local_com = 0 -> pos tracks com).
            new_com = body.world_com + new_lin * dt
            dq = quat_from_scaled_axis(new_ang * dt)
            q = quat_mul(dq, body.rot)
            body.rot = q / np.linalg.norm(q)
            body.pos = new_com
            # gravity on dynamic bodies, after integration.
            new_lin = new_lin + grav * (body.inv_mass != 0.0) * dt
            body.linvel = new_lin
            body.angvel = new_ang
        return lin_imp, ang_imp
