"""Elastic constitutive models (corotated linear + Neo-Hookean).

Physics parity with /root/reference/src/models/linear_elasticity.wgsl:14-41
and neo_hookean_elasticity.wgsl:12-26, rebuilt as batched jnp functions over
[..., d, d] deformation gradients (vectorized per particle on the VPU rather
than one GPU thread per particle).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.math.svd import svd, recompose


def lame_lambda_mu(young_modulus, poisson_ratio):
    """Lame parameters from Young's modulus / Poisson ratio.

    Mirrors /root/reference/src/models/mod.rs:52-61.
    """
    lam = (
        young_modulus
        * poisson_ratio
        / ((1.0 + poisson_ratio) * (1.0 - 2.0 * poisson_ratio))
    )
    mu = young_modulus / (2.0 * (1.0 + poisson_ratio))
    return lam, mu


@dataclasses.dataclass(frozen=True)
class ElasticCoefficients:
    """Host-side per-particle elastic coefficients (lambda, mu).

    API parity: /root/reference/src/models/mod.rs:63-75.
    """

    lam: float
    mu: float

    @staticmethod
    def from_young_modulus(young_modulus: float, poisson_ratio: float):
        lam, mu = lame_lambda_mu(young_modulus, poisson_ratio)
        return ElasticCoefficients(lam=float(lam), mu=float(mu))


def kirchoff_stress_corotated(lam, mu, def_grad):
    """Corotated linear-elasticity Kirchhoff stress.

    tau = 2 mu (F - R) F^T + lambda J (J - 1) I  written exactly as the
    reference computes it: U diag(S - 1) Vt F^T * 2mu + diag term
    (linear_elasticity.wgsl:14-41; note the reference's ``Svd2::recompose``
    of the shifted singular values).
    """
    d = def_grad.shape[-1]
    u, s, vt = svd(def_grad)
    j = jnp.prod(s, axis=-1)
    shifted = recompose(u, s - 1.0, vt)
    result = 2.0 * mu[..., None, None] * jnp.einsum(
        "...ik,...jk->...ij", shifted, def_grad
    )
    diag = lam * (j - 1.0) * j
    eye = jnp.eye(d, dtype=def_grad.dtype)
    return result + diag[..., None, None] * eye


def kirchoff_stress_neo_hookean(lam, mu, def_grad):
    """Neo-Hookean Kirchhoff stress: mu F F^T + (lambda log J - mu) I.

    Parity: neo_hookean_elasticity.wgsl:12-26 (including the 1e-10 J clamp).
    """
    d = def_grad.shape[-1]
    j = jnp.maximum(jnp.linalg.det(def_grad), 1e-10)
    diag = lam * jnp.log(j) - mu
    ft = jnp.einsum("...ik,...jk->...ij", def_grad, def_grad)
    eye = jnp.eye(d, dtype=def_grad.dtype)
    return mu[..., None, None] * ft + diag[..., None, None] * eye


# --------------------------------------------------------------- channel form
def kirchoff_stress_corotated_ch(lam, mu, fc):
    """Channel-level corotated stress: fc dict (i,j)->[N], returns same form.

    Lane-efficient variant for the TPU hot path (no [N,3,3] intermediates).
    """
    from wgsparkl_tpu.math.svd import svd3x3_ch

    uc, sig, vc = svd3x3_ch(fc)
    j = sig[0] * sig[1] * sig[2]
    diag = lam * (j - 1.0) * j
    two_mu = 2.0 * mu
    out = {}
    for i in range(3):
        for jj in range(3):
            # shifted[i, k] = sum_m uc[m][i] (sig[m]-1) vc[m][k]
            # result[i, jj] = 2 mu sum_k shifted[i, k] * F[jj, k]  (+ diag)
            acc = 0.0
            for k in range(3):
                shifted_ik = sum(
                    uc[m][i] * (sig[m] - 1.0) * vc[m][k] for m in range(3)
                )
                acc = acc + shifted_ik * fc[(jj, k)]
            out[(i, jj)] = two_mu * acc + (diag if i == jj else 0.0)
    return out


def kirchoff_stress_neo_hookean_ch(lam, mu, fc):
    import jax.numpy as jnp

    det = (
        fc[(0, 0)] * (fc[(1, 1)] * fc[(2, 2)] - fc[(1, 2)] * fc[(2, 1)])
        - fc[(0, 1)] * (fc[(1, 0)] * fc[(2, 2)] - fc[(1, 2)] * fc[(2, 0)])
        + fc[(0, 2)] * (fc[(1, 0)] * fc[(2, 1)] - fc[(1, 1)] * fc[(2, 0)])
    )
    j = jnp.maximum(det, 1e-10)
    diag = lam * jnp.log(j) - mu
    out = {}
    for i in range(3):
        for jj in range(3):
            fft = sum(fc[(i, k)] * fc[(jj, k)] for k in range(3))
            out[(i, jj)] = mu * fft + (diag if i == jj else 0.0)
    return out


def kirchoff_stress_corotated_ch2(lam, mu, fc):
    """2D channel-level corotated stress (see kirchoff_stress_corotated_ch);
    uses the trig-free channel SVD2."""
    from wgsparkl_tpu.math.svd import svd2x2_ch

    uc, sig, vc = svd2x2_ch(fc)
    j = sig[0] * sig[1]
    diag = lam * (j - 1.0) * j
    two_mu = 2.0 * mu
    out = {}
    for i in range(2):
        for jj in range(2):
            acc = 0.0
            for k in range(2):
                shifted_ik = sum(
                    uc[m][i] * (sig[m] - 1.0) * vc[m][k] for m in range(2)
                )
                acc = acc + shifted_ik * fc[(jj, k)]
            out[(i, jj)] = two_mu * acc + (diag if i == jj else 0.0)
    return out


def kirchoff_stress_neo_hookean_ch2(lam, mu, fc):
    import jax.numpy as jnp

    det = fc[(0, 0)] * fc[(1, 1)] - fc[(0, 1)] * fc[(1, 0)]
    j = jnp.maximum(det, 1e-10)
    diag = lam * jnp.log(j) - mu
    out = {}
    for i in range(2):
        for jj in range(2):
            fft = sum(fc[(i, k)] * fc[(jj, k)] for k in range(2))
            out[(i, jj)] = mu * fft + (diag if i == jj else 0.0)
    return out


def elastic_arrays(models: list[ElasticCoefficients]) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list of per-particle coefficients into SoA arrays."""
    lam = np.asarray([m.lam for m in models], dtype=np.float32)
    mu = np.asarray([m.mu for m in models], dtype=np.float32)
    return lam, mu
