"""SVD2/SVD3 numeric-correctness tests vs the numpy oracle.

The reference has no numeric tests for its wgebra SVD shaders; we follow the
GPU-vs-CPU oracle pattern of its prefix-sum test
(/root/reference/src/grid/prefix_sum.rs:180-229) for every math kernel.
"""

import numpy as np
import pytest

from wgsparkl_tpu.math import svd2x2, svd3x3, recompose


def _check_signed_svd(f, u, s, vt, tol):
    d = f.shape[-1]
    u = np.asarray(u, np.float64)
    s = np.asarray(s, np.float64)
    vt = np.asarray(vt, np.float64)
    eye = np.broadcast_to(np.eye(d), u.shape)
    # Orthogonality and proper rotations.
    np.testing.assert_allclose(u @ np.swapaxes(u, -1, -2), eye, atol=tol)
    np.testing.assert_allclose(vt @ np.swapaxes(vt, -1, -2), eye, atol=tol)
    np.testing.assert_allclose(np.linalg.det(u), 1.0, atol=tol)
    np.testing.assert_allclose(np.linalg.det(vt), 1.0, atol=tol)
    # Reconstruction.
    rec = u * s[..., None, :] @ vt
    np.testing.assert_allclose(rec, f, atol=tol * np.maximum(1.0, np.abs(f).max()))
    # Ordering: s0 >= s1 >= ... and last carries sign of det.
    assert np.all(s[..., :-1] >= s[..., 1:] - tol)
    detf = np.linalg.det(f)
    assert np.all(np.sign(s[..., -1]) * np.sign(detf) >= -tol)
    # Match magnitudes against numpy's singular values.
    s_np = np.linalg.svd(f, compute_uv=False)
    np.testing.assert_allclose(np.abs(s), s_np, atol=tol * np.maximum(1.0, s_np.max()))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_svd2_random(seed):
    rng = np.random.default_rng(seed)
    f = rng.normal(size=(512, 2, 2)).astype(np.float32)
    u, s, vt = svd2x2(f)
    _check_signed_svd(f.astype(np.float64), u, s, vt, 2e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_svd3_random(seed):
    # Tolerance note: the F^T F Jacobi formulation loses half the fp32 digits
    # on near-zero singular values (sigma_min^2 underflows relative to
    # sigma_max^2) — same precision class as the reference's wgebra svd3.
    rng = np.random.default_rng(seed)
    f = rng.normal(size=(512, 3, 3)).astype(np.float32)
    u, s, vt = svd3x3(f)
    _check_signed_svd(f.astype(np.float64), u, s, vt, 5e-4)


def test_svd3_special_cases():
    eye = np.eye(3, dtype=np.float32)
    cases = np.stack(
        [
            eye,
            2.0 * eye,
            np.diag([3.0, 2.0, 1.0]).astype(np.float32),
            np.diag([1.0, 1.0, -1.0]).astype(np.float32),  # reflection
            np.diag([1.0, 1e-5, 1e-5]).astype(np.float32),  # near rank-1
            np.diag([2.0, 1.0, 0.0]).astype(np.float32),  # exactly rank-2
            eye + 1e-4 * np.ones((3, 3), dtype=np.float32),  # near identity
            np.zeros((3, 3), dtype=np.float32) + np.diag([1e-7, 1e-7, 1e-7]).astype(np.float32),
        ]
    )
    u, s, vt = svd3x3(cases)
    _check_signed_svd(cases.astype(np.float64), u, s, vt, 1e-4)


def test_svd2_special_cases():
    eye = np.eye(2, dtype=np.float32)
    cases = np.stack(
        [
            eye,
            np.diag([1.0, -1.0]).astype(np.float32),
            np.diag([5.0, 1e-6]).astype(np.float32),
            np.array([[0.0, 1.0], [1.0, 0.0]], np.float32),  # reflection swap
            eye * 1e-6,
        ]
    )
    u, s, vt = svd2x2(cases)
    _check_signed_svd(cases.astype(np.float64), u, s, vt, 1e-5)


def test_svd3_large_stretch():
    # MPM fracture check stresses large stretches (particle_update.wgsl:96-115).
    rng = np.random.default_rng(3)
    f = rng.normal(size=(128, 3, 3)).astype(np.float32)
    f = f * np.array([10.0, 1.0, 0.1], np.float32)[None, None, :]
    u, s, vt = svd3x3(f)
    _check_signed_svd(f.astype(np.float64), u, s, vt, 2e-4)


def test_recompose_roundtrip():
    rng = np.random.default_rng(7)
    f = rng.normal(size=(64, 3, 3)).astype(np.float32)
    u, s, vt = svd3x3(f)
    np.testing.assert_allclose(np.asarray(recompose(u, s, vt)), f, atol=2e-4)
