"""Branch-free batched 2x2 / 3x3 SVD for TPU (VPU-friendly, vmappable).

The reference offloads these to external WGSL shaders (wgebra ``svd2``/``svd3``,
used by ``/root/reference/src/models/linear_elasticity.wgsl:4-5`` and
``/root/reference/src/solver/particle_update.wgsl:10-11``).  Here they are
pure jnp functions over arbitrary leading batch dimensions.

Performance notes (this is the hottest math kernel: 3 SVDs per sand particle
per substep, SURVEY.md 7.3):
  * the 3x3 path is fully *channelized* — the symmetric matrix lives in 6
    [N]-shaped channel arrays and the Jacobi rotations are straight-line
    elementwise FMAs, so XLA vectorizes everything onto VPU lanes with no
    tiny [N,3,3] dot_generals;
  * rotations use trig-free Givens (rsqrt), no atan2/sin/cos transcendentals.

Convention ("signed SVD" as used throughout graphics MPM):
  F = U @ diag(S) @ Vt  with  U, V proper rotations (det=+1),
  S sorted by decreasing value, and the *last* singular value carrying the
  sign of det(F) (negative iff the deformation is inverted).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _givens(app, aqq, apq):
    """Trig-free Givens (c, s) zeroing the (p, q) entry of a symmetric 2x2.

    For J = [[c, -s], [s, c]] in the (p, q) plane, J^T A J has zero (p, q)
    entry when t = tan(theta) solves t^2 + 2 tau t - 1 = 0 with
    tau = (app - aqq) / (2 apq); the stable root is
    t = sign(tau)/(|tau| + sqrt(1 + tau^2)).  Pure FMA + rsqrt —
    atan2/sin/cos would dominate the whole substep at 24 rotations x 3 SVDs
    per particle.
    """
    nonzero = jnp.abs(apq) > 1e-30
    safe = jnp.where(nonzero, apq, 1.0)
    tau = (app - aqq) / (2.0 * safe)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(nonzero, t, 0.0)
    c = jax.lax.rsqrt(1.0 + t * t)
    return c, t * c


def svd2x2_ch(fc):
    """Channel-level trig-free signed SVD of 2x2 matrices.

    fc: dict (i, j) -> [...] channels of F.  Polar decomposition (exact in
    closed form for 2x2) followed by one trig-free Givens eigen-rotation of
    the symmetric factor — rsqrt/FMA only, no atan2/sin/cos (CLAUDE.md TPU
    rule #1; the old arctan2 form made 2D substeps transcendental-bound).

    Returns (uc, sig, vc) like svd3x3_ch: uc[k]/vc[k] = channel entries of
    the k-th COLUMN of U/V; sig = [s0, s1], s0 >= |s1|,
    sign(s1) = sign(det F), U/V in SO(2).
    """
    a, b = fc[(0, 0)], fc[(0, 1)]
    c, d = fc[(1, 0)], fc[(1, 1)]
    det = a * d - b * c
    sgn = jnp.where(det < 0.0, -1.0, 1.0)
    # Reflect so det(B) >= 0: B = F @ diag(1, sgn).
    b01, b11 = b * sgn, d * sgn

    # Polar rotation R of B: [[x, -y], [y, x]] / hypot(x, y).
    x = a + b11
    y = c - b01
    h2 = x * x + y * y
    ok = h2 > 1e-30
    inv_h = jnp.where(ok, jax.lax.rsqrt(jnp.maximum(h2, 1e-30)), 0.0)
    cr = jnp.where(ok, x * inv_h, 1.0)
    sr = y * inv_h

    # Symmetric factor P = R^T B (PSD up to roundoff).
    p00 = cr * a + sr * c
    p01 = cr * b01 + sr * b11
    p11 = -sr * b01 + cr * b11

    # Trig-free Givens diagonalizing P: V = [[cv, -sv], [sv, cv]].
    cv, sv = _givens(p00, p11, p01)
    l0 = cv * cv * p00 + 2.0 * cv * sv * p01 + sv * sv * p11
    l1 = sv * sv * p00 - 2.0 * cv * sv * p01 + cv * cv * p11

    # Sort descending; the 90-degree rotation keeps V in SO(2).
    swap = l0 < l1
    cv, sv = (
        jnp.where(swap, -sv, cv),
        jnp.where(swap, cv, sv),
    )
    s0 = jnp.where(swap, l1, l0)
    s1 = jnp.where(swap, l0, l1)

    # U = R V.
    cu = cr * cv - sr * sv
    su = sr * cv + cr * sv

    # Undo the reflection: F = U diag(s0, sgn*s1) (diag(1,sgn) V^T diag(1,sgn)).
    uc = [[cu, su], [-su, cu]]          # columns of U
    vc = [[cv, sv * sgn], [-sv * sgn, cv]]  # columns of V'
    sig = [s0, s1 * sgn]
    return uc, sig, vc


def svd2x2(f):
    """Closed-form signed SVD of [..., 2, 2] matrices (trig-free).

    Returns (U, S, Vt): U,V in SO(2), S = [s0, s1] with s0 >= |s1| and
    sign(s1) = sign(det f).
    """
    fc = {(i, j): f[..., i, j] for i in range(2) for j in range(2)}
    uc, sig, vc = svd2x2_ch(fc)
    u = jnp.stack([jnp.stack(col, axis=-1) for col in uc], axis=-1)
    s = jnp.stack(sig, axis=-1)
    vt = jnp.stack([jnp.stack(col, axis=-1) for col in vc], axis=-2)
    return u, s, vt


# ------------------------------------------------------------------ 3x3 path
def _key(i, j):
    return (i, j) if i <= j else (j, i)


def _jacobi_rot(sym, v, p, q):
    """One Jacobi rotation in the (p, q) plane on channelized state.

    sym: dict {(i,j) i<=j} -> [...] channels of the symmetric matrix.
    v:   dict {(i,j)} -> [...] channels of the accumulated eigenvector matrix.
    """
    r = 3 - p - q
    app, aqq, apq = sym[_key(p, p)], sym[_key(q, q)], sym[_key(p, q)]
    c, s = _givens(app, aqq, apq)
    c2, s2, cs = c * c, s * s, c * s

    new = dict(sym)
    new[_key(p, p)] = c2 * app + 2.0 * cs * apq + s2 * aqq
    new[_key(q, q)] = s2 * app - 2.0 * cs * apq + c2 * aqq
    new[_key(p, q)] = jnp.zeros_like(apq)
    apr, aqr = sym[_key(p, r)], sym[_key(q, r)]
    # Note key order: channels store (min, max) so sign bookkeeping is direct.
    new[_key(p, r)] = c * apr + s * aqr
    new[_key(q, r)] = -s * apr + c * aqr

    vnew = dict(v)
    for i in range(3):
        vip, viq = v[(i, p)], v[(i, q)]
        vnew[(i, p)] = c * vip + s * viq
        vnew[(i, q)] = -s * vip + c * viq
    return new, vnew


def _norm3(x, y, z):
    return jnp.sqrt(x * x + y * y + z * z)


def svd3x3_ch(fc, sweeps: int = 8):
    """Channel-level signed SVD (see svd3x3).

    fc: dict (i, j) -> [...] channels of F.
    Returns (uc, sig, vc): uc[k]/vc[k] = list of the 3 channel entries of the
    k-th COLUMN of U/V; sig = list of 3 singular-value channels.
    """
    # A = F^T F, symmetric channels.
    sym = {}
    for i in range(3):
        for j in range(i, 3):
            sym[(i, j)] = sum(fc[(k, i)] * fc[(k, j)] for k in range(3))

    zero = jnp.zeros_like(fc[(0, 0)])
    one = jnp.ones_like(zero)
    v = {(i, j): (one if i == j else zero) for i in range(3) for j in range(3)}

    for _ in range(sweeps):
        sym, v = _jacobi_rot(sym, v, 0, 1)
        sym, v = _jacobi_rot(sym, v, 0, 2)
        sym, v = _jacobi_rot(sym, v, 1, 2)

    lam = [sym[(0, 0)], sym[(1, 1)], sym[(2, 2)]]
    vcols = [[v[(i, k)] for i in range(3)] for k in range(3)]  # vcols[k][i]

    # Sort the 3 eigenpairs descending (3 compare-swaps, channelwise).
    def cswap(a, b):
        la, ca = a
        lb, cb = b
        swap = la < lb
        pick = lambda x, y: jnp.where(swap, y, x)
        na = (pick(la, lb), [pick(x, y) for x, y in zip(ca, cb)])
        nb = (pick(lb, la), [pick(y, x) for x, y in zip(ca, cb)])
        return na, nb

    e0, e1, e2 = (lam[0], vcols[0]), (lam[1], vcols[1]), (lam[2], vcols[2])
    e0, e1 = cswap(e0, e1)
    e0, e2 = cswap(e0, e2)
    e1, e2 = cswap(e1, e2)
    lam = [e0[0], e1[0], e2[0]]
    vc = [e0[1], e1[1], e2[1]]  # vc[k][i] = V[i, k]

    # Proper rotation: v2 <- v0 x v1 (forces det(V) = +1).
    v2 = [
        vc[0][1] * vc[1][2] - vc[0][2] * vc[1][1],
        vc[0][2] * vc[1][0] - vc[0][0] * vc[1][2],
        vc[0][0] * vc[1][1] - vc[0][1] * vc[1][0],
    ]
    vc = [vc[0], vc[1], v2]

    sig = [jnp.sqrt(jnp.maximum(l, 0.0)) for l in lam]

    # U columns: F v_k, Gram-Schmidt orthonormalized with fallbacks, last
    # column via cross product (det(U) = +1 always).
    def matvec(cols):
        return [
            sum(fc[(i, k)] * cols[k] for k in range(3)) for i in range(3)
        ]

    def normalize(u, fallback):
        n = _norm3(*u)
        ok = n > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, n, 1.0), 0.0)
        return [jnp.where(ok, x * inv, fb) for x, fb in zip(u, fallback)]

    fv0 = matvec(vc[0])
    fv1 = matvec(vc[1])
    u0 = normalize(fv0, [one, zero, zero])
    d01 = sum(a * b for a, b in zip(fv1, u0))
    u1r = [a - d01 * b for a, b in zip(fv1, u0)]
    # Fallback: a vector orthogonal to u0 (cross with the least-aligned axis).
    ax = jnp.abs(u0[0])
    alt_a = [zero, -u0[2], u0[1]]       # u0 x e_x
    alt_b = [u0[2], zero, -u0[0]]       # u0 x e_y
    use_a = ax < 0.9
    alt = [jnp.where(use_a, a, b) for a, b in zip(alt_a, alt_b)]
    nalt = _norm3(*alt)
    alt = [x / jnp.maximum(nalt, 1e-30) for x in alt]
    u1 = normalize(u1r, alt)
    u2 = [
        u0[1] * u1[2] - u0[2] * u1[1],
        u0[2] * u1[0] - u0[0] * u1[2],
        u0[0] * u1[1] - u0[1] * u1[0],
    ]

    # det(U)=det(V)=+1 forces the smallest singular value to carry det's sign.
    detf = (
        fc[(0, 0)] * (fc[(1, 1)] * fc[(2, 2)] - fc[(1, 2)] * fc[(2, 1)])
        - fc[(0, 1)] * (fc[(1, 0)] * fc[(2, 2)] - fc[(1, 2)] * fc[(2, 0)])
        + fc[(0, 2)] * (fc[(1, 0)] * fc[(2, 1)] - fc[(1, 1)] * fc[(2, 0)])
    )
    sig[2] = sig[2] * jnp.where(detf < 0, -1.0, 1.0)
    return [u0, u1, u2], sig, vc


@partial(jax.jit, static_argnames=("sweeps",))
def svd3x3(f, sweeps: int = 8):
    """Signed SVD of [..., 3, 3] matrices via channelized cyclic Jacobi on
    F^T F.  Branch-free; `sweeps` full sweeps (3 rotations each) unrolled.

    Returns (U, S, Vt) with U, V in SO(3), S[..., 0] >= S[..., 1] >= |S[..., 2]|
    and sign(S[..., 2]) = sign(det f).
    """
    fc = {(i, j): f[..., i, j] for i in range(3) for j in range(3)}
    uc, sig, vc = svd3x3_ch(fc, sweeps)
    u = jnp.stack([jnp.stack(col, axis=-1) for col in uc], axis=-1)
    s = jnp.stack(sig, axis=-1)
    vt = jnp.stack([jnp.stack(col, axis=-1) for col in vc], axis=-2)
    return u, s, vt


def eig33_sigma_ch(fc, sweeps: int = 8):
    """Singular values only (no U/V build) — for the fracture check."""
    sym = {}
    for i in range(3):
        for j in range(i, 3):
            sym[(i, j)] = sum(fc[(k, i)] * fc[(k, j)] for k in range(3))
    zero = jnp.zeros_like(fc[(0, 0)])
    one = jnp.ones_like(zero)
    v = {(i, j): (one if i == j else zero) for i in range(3) for j in range(3)}
    for _ in range(sweeps):
        sym, v = _jacobi_rot(sym, v, 0, 1)
        sym, v = _jacobi_rot(sym, v, 0, 2)
        sym, v = _jacobi_rot(sym, v, 1, 2)
    return [
        jnp.sqrt(jnp.maximum(sym[(k, k)], 0.0)) for k in range(3)
    ]


def svd(f, sweeps: int = 8):
    """Dimension-dispatching signed SVD for [..., d, d] with d in {2, 3}."""
    d = f.shape[-1]
    if d == 2:
        return svd2x2(f)
    if d == 3:
        return svd3x3(f, sweeps=sweeps)
    raise ValueError(f"svd only supports 2x2 or 3x3 blocks, got d={d}")


def recompose(u, s, vt):
    """U @ diag(S) @ Vt (mirrors wgebra's ``recompose``)."""
    return jnp.einsum("...ik,...k,...kj->...ij", u, s, vt)
