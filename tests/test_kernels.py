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


def test_oriented_nn_kernel_matches_float64(rng):
    """Oriented kernel (normal-gated min distance) vs float64 numpy,
    including rows where NO reference normal agrees (inf) and zero-normal
    padded references (never pass the gate)."""
    from plade_tpu.kernels.nn import oriented_min_dist_sq

    def unit(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    q = rng.normal(size=(77, 3)).astype(np.float32)
    qn = unit(rng.normal(size=(77, 3))).astype(np.float32)
    r = rng.normal(size=(999, 3)).astype(np.float32)
    rn = unit(rng.normal(size=(999, 3))).astype(np.float32)
    # one query whose normal is opposite to every reference normal
    qn[3] = unit(-(rn.mean(0, keepdims=True)))[0]
    cos = 0.95
    d = oriented_min_dist_sq(jnp.asarray(q), jnp.asarray(qn),
                             jnp.asarray(r), jnp.asarray(rn), cos,
                             bq=64, bt=512, interpret=True)
    qe, re = q.astype(np.float64), r.astype(np.float64)
    d2 = ((qe[:, None, :] - re[None, :, :]) ** 2).sum(-1)
    gate = (qn.astype(np.float64) @ rn.astype(np.float64).T) >= cos
    d2 = np.where(gate, d2, np.inf)
    want = d2.min(1)
    got = np.asarray(d)
    fin = np.isfinite(want)
    np.testing.assert_allclose(got[fin], want[fin], rtol=1e-5, atol=1e-6)
    assert np.all(np.isinf(got[~fin]) | (got[~fin] > 1e30))


def test_oriented_nn_kernel_matches_jnp_fallback(rng):
    """The TPU kernel and the blocked-jnp CPU fallback in verify/overlap.py
    must agree — they are two lowerings of one function."""
    from plade_tpu.kernels.nn import oriented_min_dist_sq as kern
    from plade_tpu.verify.overlap import _oriented_min_dist_sq_jnp

    def unit(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    q = jnp.asarray(rng.normal(size=(65, 3)).astype(np.float32))
    qn = jnp.asarray(unit(rng.normal(size=(65, 3))).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32))
    rn = jnp.asarray(unit(rng.normal(size=(500, 3))).astype(np.float32))
    a = np.asarray(kern(q, qn, r, rn, 0.7, bq=64, bt=256, interpret=True))
    b = np.asarray(_oriented_min_dist_sq_jnp(q, qn, r, rn, 0.7, block=128))
    fin = np.isfinite(b)
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-4, atol=1e-6)
    assert np.all(~np.isfinite(a[~fin]) | (a[~fin] > 1e30))


def test_cc_lanes_kernel_matches_single(rng):
    """Lane-batched CC kernel: each lane labels independently (no
    propagation across the packed lane boundary) and matches the
    single-lane kernel exactly."""
    from plade_tpu.kernels.cc import close_and_label, close_and_label_lanes

    G, L = 32, 3
    occ = (rng.random((L, G, G)) < 0.3).astype(np.int32)
    # adversarial: occupied full columns at every lane edge, so any
    # cross-lane leak would merge components
    occ[:, :, 0] = 1
    occ[:, :, G - 1] = 1
    got = np.asarray(close_and_label_lanes(jnp.asarray(occ), iters=64,
                                           interpret=True))
    for lane in range(L):
        want = np.asarray(close_and_label(jnp.asarray(occ[lane]), iters=64,
                                          interpret=True))
        np.testing.assert_array_equal(got[lane], want)
