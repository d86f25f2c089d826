"""Pallas kernel tests (interpret mode on the CPU test backend)."""
import jax.numpy as jnp
import numpy as np

from plade_tpu.kernels.nn import nearest_neighbor
from plade_tpu.knn import bruteforce


def test_nn_kernel_matches_bruteforce(rng):
    q = jnp.asarray(rng.normal(size=(301, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(1234, 3)).astype(np.float32))
    d, i = nearest_neighbor(q, r, bq=128, bt=512, interpret=True)
    # exact reference in float64
    qe = np.asarray(q, np.float64)
    re = np.asarray(r, np.float64)
    d2 = ((qe[:, None, :] - re[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d), d2.min(1), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), d2.argmin(1))


def test_nn_kernel_padding_never_wins(rng):
    # refs smaller than one tile: padded rows must not win
    q = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    d, i = nearest_neighbor(q, r, bq=8, bt=512, interpret=True)
    assert int(np.asarray(i).max()) < 5
    qe = np.asarray(q, np.float64)
    re = np.asarray(r, np.float64)
    d2 = ((qe[:, None, :] - re[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d), d2.min(1), rtol=1e-5, atol=1e-6)
