"""Drucker-Prager plastic return mapping (sand), with hardening.

Physics parity with /root/reference/src/models/drucker_prager.wgsl:25-158
(Klar et al. 2016 style log-strain return map), rebuilt branch-free with
`where` masks so it vmaps/vectorizes over all particles at once.

Disabled plasticity: the reference encodes "no plasticity" as lambda = -1
(models/mod.rs:24) but its WGSL gate tests ``lambda == 0`` (a latent quirk,
never exercised because every elastic example sets phase=1.0 which skips the
projection entirely). We use lambda <= 0 as the disabled sentinel, which
matches the observable behavior of every reference scene.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.math.svd import svd, recompose
from wgsparkl_tpu.models.elasticity import lame_lambda_mu


@dataclasses.dataclass(frozen=True)
class DruckerPrager:
    """Host-side Drucker-Prager parameters (h0-h3 hardening + Lame).

    API parity: /root/reference/src/models/drucker_prager.rs:8-34 (defaults
    h0=35deg, h1=9deg, h2=0.2, h3=10deg).
    """

    h0: float = float(np.radians(35.0))
    h1: float = float(np.radians(9.0))
    h2: float = 0.2
    h3: float = float(np.radians(10.0))
    lam: float = -1.0
    mu: float = -1.0

    @staticmethod
    def new(young_modulus: float, poisson_ratio: float) -> "DruckerPrager":
        if young_modulus > 0.0:
            lam, mu = lame_lambda_mu(young_modulus, poisson_ratio)
        else:
            lam, mu = -1.0, -1.0
        return DruckerPrager(lam=float(lam), mu=float(mu))

    @staticmethod
    def disabled() -> "DruckerPrager":
        return DruckerPrager()


@dataclasses.dataclass(frozen=True)
class DruckerPragerState:
    """Initial per-particle plastic state (det=1, hardening=1, vol gain=0).

    Parity: drucker_prager.rs:44-52.
    """

    det: float = 1.0
    hardening: float = 1.0
    log_vol_gain: float = 0.0


def _alpha(h0, h1, h2, h3, q):
    """Friction mobilization alpha(q) (drucker_prager.wgsl:25-29)."""
    angle = h0 + (h1 * q - h3) * jnp.exp(-h2 * q)
    s = jnp.sin(angle)
    return jnp.sqrt(2.0 / 3.0) * (2.0 * s) / (3.0 - s)


def drucker_prager_project(params, state, def_grad):
    """Vectorized plastic projection of [..., d, d] deformation gradients.

    params: dict of arrays h0,h1,h2,h3,lam,mu [...]
    state:  dict of arrays det,hardening,log_vol_gain [...]
    Returns (new_state dict, new_def_grad).

    Parity: drucker_prager.wgsl project() + project_deformation_gradient().
    """
    d = def_grad.shape[-1]
    df = jnp.asarray(float(d), def_grad.dtype)
    lam, mu = params["lam"], params["mu"]
    enabled = lam > 0.0

    u, sig, vt = svd(def_grad)
    alpha = _alpha(params["h0"], params["h1"], params["h2"], params["h3"], state["hardening"])

    # Log-strain return map (project_deformation_gradient).
    sig_safe = jnp.maximum(sig, 1e-12)
    strain = jnp.log(sig_safe) + (state["log_vol_gain"] / df)[..., None]
    trace = jnp.sum(strain, axis=-1)
    dev = strain - (trace / df)[..., None]
    dev_norm = jnp.linalg.norm(dev, axis=-1)

    # Case A: expansion or pure volumetric -> project to undeformed (sig=1).
    case_a = (trace > 0.0) | (dev_norm == 0.0)
    hard_a = jnp.linalg.norm(strain, axis=-1)

    gamma = dev_norm + (df * lam + 2.0 * mu) / (2.0 * mu) * trace * alpha
    # Case B: inside yield surface -> no change.
    case_b = (~case_a) & (gamma <= 0.0)

    # Case C: return to yield surface along deviatoric direction.
    h = strain - dev * (gamma / jnp.maximum(dev_norm, 1e-20))[..., None]
    sig_c = jnp.exp(h)

    new_sig = jnp.where(case_a[..., None], jnp.ones_like(sig), sig_c)
    valid = ~case_b
    plastic_hardening = jnp.where(case_a, hard_a, gamma)

    prev_det = jnp.prod(sig, axis=-1)
    new_det = jnp.prod(new_sig, axis=-1)
    apply = enabled & valid

    out_state = {
        "det": jnp.where(
            apply, state["det"] * prev_det / jnp.where(new_det != 0, new_det, 1.0), state["det"]
        ),
        "hardening": jnp.where(
            apply, state["hardening"] + plastic_hardening, state["hardening"]
        ),
        "log_vol_gain": jnp.where(
            apply,
            state["log_vol_gain"]
            + jnp.log(jnp.maximum(prev_det, 1e-20))
            - jnp.log(jnp.maximum(new_det, 1e-20)),
            state["log_vol_gain"],
        ),
    }
    projected = recompose(u, new_sig, vt)
    new_f = jnp.where(apply[..., None, None], projected, def_grad)
    return out_state, new_f


def drucker_prager_project_ch(params, state, fc):
    """Channel-level Drucker-Prager projection (see drucker_prager_project).

    fc: dict (i,j)->[N].  Returns (new_state dict, new fc dict).
    """
    from wgsparkl_tpu.math.svd import svd3x3_ch

    lam, mu = params["lam"], params["mu"]
    enabled = lam > 0.0
    df = 3.0

    uc, sig, vc = svd3x3_ch(fc)
    alpha = _alpha(
        params["h0"], params["h1"], params["h2"], params["h3"],
        state["hardening"],
    )
    strain = [
        jnp.log(jnp.maximum(s, 1e-12)) + state["log_vol_gain"] / df
        for s in sig
    ]
    trace = strain[0] + strain[1] + strain[2]
    dev = [s - trace / df for s in strain]
    dev_norm = jnp.sqrt(dev[0] ** 2 + dev[1] ** 2 + dev[2] ** 2)

    case_a = (trace > 0.0) | (dev_norm == 0.0)
    hard_a = jnp.sqrt(strain[0] ** 2 + strain[1] ** 2 + strain[2] ** 2)
    gamma = dev_norm + (df * lam + 2.0 * mu) / (2.0 * mu) * trace * alpha
    case_b = (~case_a) & (gamma <= 0.0)

    scale = gamma / jnp.maximum(dev_norm, 1e-20)
    sig_c = [jnp.exp(s - d * scale) for s, d in zip(strain, dev)]
    new_sig = [jnp.where(case_a, 1.0, s) for s in sig_c]
    valid = ~case_b
    plastic_hardening = jnp.where(case_a, hard_a, gamma)

    prev_det = sig[0] * sig[1] * sig[2]
    new_det = new_sig[0] * new_sig[1] * new_sig[2]
    apply = enabled & valid

    out_state = {
        "det": jnp.where(
            apply,
            state["det"] * prev_det / jnp.where(new_det != 0, new_det, 1.0),
            state["det"],
        ),
        "hardening": jnp.where(
            apply, state["hardening"] + plastic_hardening, state["hardening"]
        ),
        "log_vol_gain": jnp.where(
            apply,
            state["log_vol_gain"]
            + jnp.log(jnp.maximum(prev_det, 1e-20))
            - jnp.log(jnp.maximum(new_det, 1e-20)),
            state["log_vol_gain"],
        ),
    }
    new_fc = {}
    for i in range(3):
        for j in range(3):
            proj = sum(uc[m][i] * new_sig[m] * vc[m][j] for m in range(3))
            new_fc[(i, j)] = jnp.where(apply, proj, fc[(i, j)])
    return out_state, new_fc


def drucker_prager_project_ch2(params, state, fc):
    """2D channel-level Drucker-Prager projection (trig-free channel SVD2).

    fc: dict (i,j)->[N], i,j in {0,1}.  Returns (new_state dict, new fc).
    """
    from wgsparkl_tpu.math.svd import svd2x2_ch

    lam, mu = params["lam"], params["mu"]
    enabled = lam > 0.0
    df = 2.0

    uc, sig, vc = svd2x2_ch(fc)
    alpha = _alpha(
        params["h0"], params["h1"], params["h2"], params["h3"],
        state["hardening"],
    )
    strain = [
        jnp.log(jnp.maximum(s, 1e-12)) + state["log_vol_gain"] / df
        for s in sig
    ]
    trace = strain[0] + strain[1]
    dev = [s - trace / df for s in strain]
    dev_norm = jnp.sqrt(dev[0] ** 2 + dev[1] ** 2)

    case_a = (trace > 0.0) | (dev_norm == 0.0)
    hard_a = jnp.sqrt(strain[0] ** 2 + strain[1] ** 2)
    gamma = dev_norm + (df * lam + 2.0 * mu) / (2.0 * mu) * trace * alpha
    case_b = (~case_a) & (gamma <= 0.0)

    scale = gamma / jnp.maximum(dev_norm, 1e-20)
    sig_c = [jnp.exp(s - d * scale) for s, d in zip(strain, dev)]
    new_sig = [jnp.where(case_a, 1.0, s) for s in sig_c]
    valid = ~case_b
    plastic_hardening = jnp.where(case_a, hard_a, gamma)

    prev_det = sig[0] * sig[1]
    new_det = new_sig[0] * new_sig[1]
    apply = enabled & valid

    out_state = {
        "det": jnp.where(
            apply,
            state["det"] * prev_det / jnp.where(new_det != 0, new_det, 1.0),
            state["det"],
        ),
        "hardening": jnp.where(
            apply, state["hardening"] + plastic_hardening, state["hardening"]
        ),
        "log_vol_gain": jnp.where(
            apply,
            state["log_vol_gain"]
            + jnp.log(jnp.maximum(prev_det, 1e-20))
            - jnp.log(jnp.maximum(new_det, 1e-20)),
            state["log_vol_gain"],
        ),
    }
    new_fc = {}
    for i in range(2):
        for j in range(2):
            proj = sum(uc[m][i] * new_sig[m] * vc[m][j] for m in range(2))
            new_fc[(i, j)] = jnp.where(apply, proj, fc[(i, j)])
    return out_state, new_fc


def drucker_prager_arrays(plasticities: list[DruckerPrager]):
    """Pack host params into SoA dict of float32 arrays."""
    def col(attr):
        return np.asarray([getattr(p, attr) for p in plasticities], np.float32)

    return {
        "h0": col("h0"),
        "h1": col("h1"),
        "h2": col("h2"),
        "h3": col("h3"),
        "lam": col("lam"),
        "mu": col("mu"),
    }
