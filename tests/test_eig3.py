"""Closed-form symmetric 3x3 eigensolver vs float64 numpy (geometry/eig3)."""
import numpy as np
import jax.numpy as jnp

from plade_tpu.geometry.eig3 import smallest_eigvec3, sym_eigh3, sym_eigvals3


def _random_syms(rng, n):
    M = rng.normal(size=(n, 3, 3))
    return (M + np.swapaxes(M, -1, -2)) / 2


def test_eigvals_match_numpy(rng):
    A = _random_syms(rng, 256)
    got = np.asarray(sym_eigvals3(jnp.asarray(A, jnp.float32)))
    want = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_eigvecs_are_eigvecs_and_orthonormal(rng):
    A = _random_syms(rng, 256)
    vals, vecs = sym_eigh3(jnp.asarray(A, jnp.float32))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    # orthonormal basis
    eye = np.einsum("bij,bik->bjk", vecs, vecs)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    # A v = lambda v per column
    Av = np.einsum("bij,bjk->bik", A, vecs)
    lv = vals[:, None, :] * vecs
    np.testing.assert_allclose(Av, lv, atol=5e-4)


def test_covariance_like_spectra(rng):
    """PSD covariances of thin point sets — the pipeline's actual inputs
    (plane fit: one eigenvalue ~eps^2, two large)."""
    pts = rng.normal(size=(64, 500, 3)) * np.array([5.0, 3.0, 0.01])
    R = np.linalg.qr(rng.normal(size=(64, 3, 3)))[0]
    pts = np.einsum("bij,bnj->bni", R, pts)
    cov = np.einsum("bni,bnj->bij", pts, pts) / 500.0
    n = np.asarray(smallest_eigvec3(jnp.asarray(cov, jnp.float32)))
    # the smallest eigenvector is the thin axis = R @ e_z
    want = R[:, :, 2]
    dots = np.abs(np.sum(n * want, axis=-1))
    assert dots.min() > 0.9999, dots.min()


def test_degenerate_isotropic(rng):
    """Repeated eigenvalues: any orthonormal basis is valid — require
    orthonormality and the eigen-equation, not a specific basis."""
    A = np.stack([np.eye(3) * 2.0,
                  np.diag([1.0, 1.0, 5.0]),
                  np.diag([3.0, 1.0, 1.0])])
    vals, vecs = sym_eigh3(jnp.asarray(A, jnp.float32))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    eye = np.einsum("bij,bik->bjk", vecs, vecs)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    Av = np.einsum("bij,bjk->bik", A, vecs)
    lv = vals[:, None, :] * vecs
    # arccos at r ~ +-1 costs a few 1e-4 of eigenvalue precision in f32
    np.testing.assert_allclose(Av, lv, atol=1e-3)
