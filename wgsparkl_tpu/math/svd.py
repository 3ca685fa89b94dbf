"""Branch-free batched 2x2 / 3x3 SVD for TPU (VPU-friendly, vmappable).

The reference offloads these to external WGSL shaders (wgebra ``svd2``/``svd3``,
used by ``/root/reference/src/models/linear_elasticity.wgsl:4-5`` and
``/root/reference/src/solver/particle_update.wgsl:10-11``).  Here they are
pure jnp functions over arbitrary leading batch dimensions, written with only
elementwise ops and static-index shuffles so XLA vectorizes them onto the VPU
without any gather/scatter or data-dependent control flow.

Convention ("signed SVD" as used throughout graphics MPM):
  F = U @ diag(S) @ Vt  with  U, V proper rotations (det=+1),
  S sorted by decreasing value, and the *last* singular value carrying the
  sign of det(F) (negative iff the deformation is inverted).
"""

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-20


def _rot2(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def svd2x2(f):
    """Closed-form signed SVD of [..., 2, 2] matrices.

    Returns (U, S, Vt): U,V in SO(2), S = [s0, s1] with s0 >= |s1| and
    sign(s1) = sign(det f).
    """
    a, b = f[..., 0, 0], f[..., 0, 1]
    c, d = f[..., 1, 0], f[..., 1, 1]
    e_ = (a + d) * 0.5
    f_ = (a - d) * 0.5
    g_ = (c + b) * 0.5
    h_ = (c - b) * 0.5
    q = jnp.sqrt(e_ * e_ + h_ * h_)
    r = jnp.sqrt(f_ * f_ + g_ * g_)
    s0 = q + r
    s1 = q - r
    a1 = jnp.arctan2(g_, f_)
    a2 = jnp.arctan2(h_, e_)
    beta = (a2 - a1) * 0.5
    gamma = (a2 + a1) * 0.5
    u = _rot2(gamma)
    vt = _rot2(beta)  # F = R(gamma) diag(s) R(beta): R(beta) already is V^T.
    s = jnp.stack([s0, s1], axis=-1)
    return u, s, vt


def _apply_jacobi(a, v, p, q):
    """One cyclic Jacobi rotation zeroing a[..., p, q] of symmetric a.

    Updates a <- J^T a J and v <- v J where J is a Givens rotation in the
    (p, q) plane.  Expressed as tiny batched matmuls (einsum): XLA compiles
    dot_general chains orders of magnitude faster than equivalent
    stack/slice shuffles, and on TPU they vectorize cleanly.
    """
    app = a[..., p, p]
    aqq = a[..., q, q]
    apq = a[..., p, q]
    theta = 0.5 * jnp.arctan2(2.0 * apq, app - aqq)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    eye = jnp.eye(3, dtype=a.dtype)
    j = jnp.broadcast_to(eye, a.shape)
    j = j.at[..., p, p].set(c).at[..., q, q].set(c)
    j = j.at[..., p, q].set(-s).at[..., q, p].set(s)
    a_new = jnp.einsum("...ji,...jk,...kl->...il", j, a, j)
    v_new = jnp.einsum("...ij,...jk->...ik", v, j)
    return a_new, v_new


def _sort3_desc(lam, v):
    """Sort 3 eigenpairs by decreasing eigenvalue, branch-free."""

    def cswap(lam, v, i, j):
        swap = lam[..., i] < lam[..., j]
        li = jnp.where(swap, lam[..., j], lam[..., i])
        lj = jnp.where(swap, lam[..., i], lam[..., j])
        lams = [lam[..., k] for k in range(3)]
        lams[i], lams[j] = li, lj
        sw = swap[..., None]
        vi = jnp.where(sw, v[..., :, j], v[..., :, i])
        vj = jnp.where(sw, v[..., :, i], v[..., :, j])
        cols = [v[..., :, k] for k in range(3)]
        cols[i], cols[j] = vi, vj
        return jnp.stack(lams, axis=-1), jnp.stack(cols, axis=-1)

    lam, v = cswap(lam, v, 0, 1)
    lam, v = cswap(lam, v, 0, 2)
    lam, v = cswap(lam, v, 1, 2)
    return lam, v


def _normalize(x, fallback):
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    ok = n > 1e-12
    return jnp.where(ok, x / jnp.where(ok, n, 1.0), fallback)


@partial(jax.jit, static_argnames=("sweeps",))
def svd3x3(f, sweeps: int = 8):
    """Signed SVD of [..., 3, 3] matrices via cyclic Jacobi on F^T F.

    Branch-free: `sweeps` full Jacobi sweeps (3 rotations each) are unrolled
    statically; degenerate / inverted cases are resolved with `where` masks.
    Returns (U, S, Vt) with U, V in SO(3), S[..., 0] >= S[..., 1] >= |S[..., 2]|
    and sign(S[..., 2]) = sign(det f).
    """
    ata = jnp.einsum("...ji,...jk->...ik", f, f)
    v = jnp.broadcast_to(jnp.eye(3, dtype=f.dtype), ata.shape)
    a = ata
    for _ in range(sweeps):
        a, v = _apply_jacobi(a, v, 0, 1)
        a, v = _apply_jacobi(a, v, 0, 2)
        a, v = _apply_jacobi(a, v, 1, 2)

    lam = jnp.stack([a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]], axis=-1)
    lam, v = _sort3_desc(lam, v)

    # Make V a proper rotation (flip sign of last column if needed).
    detv = jnp.linalg.det(v)
    v = v.at[..., :, 2].multiply(jnp.sign(detv)[..., None])

    sig = jnp.sqrt(jnp.maximum(lam, 0.0))

    # U columns: normalize F @ v_i, Gram-Schmidt for robustness against
    # (near-)zero singular values, last column via cross product so that
    # det(U) = +1 always.
    fv = jnp.einsum("...ij,...jk->...ik", f, v)
    ex = jnp.zeros_like(fv[..., :, 0]).at[..., 0].set(1.0)
    u0 = _normalize(fv[..., :, 0], ex)
    u1_raw = fv[..., :, 1]
    u1_raw = u1_raw - jnp.sum(u1_raw * u0, axis=-1, keepdims=True) * u0
    # Fallback: any vector orthogonal to u0.
    ey = jnp.zeros_like(u0).at[..., 1].set(1.0)
    alt = jnp.cross(u0, ex)
    alt = jnp.where(
        jnp.linalg.norm(alt, axis=-1, keepdims=True) > 1e-6, alt, jnp.cross(u0, ey)
    )
    u1 = _normalize(u1_raw, _normalize(alt, ey))
    u2 = jnp.cross(u0, u1)
    u = jnp.stack([u0, u1, u2], axis=-1)

    # det(U)=det(V)=+1 forces the smallest singular value to carry det's sign.
    detf = jnp.linalg.det(f)
    sig = sig.at[..., 2].multiply(jnp.where(detf < 0, -1.0, 1.0))
    return u, sig, jnp.swapaxes(v, -1, -2)


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
