"""Descriptor matching and pose clustering unit tests.

The clustering tests pin the single-linkage semantics of the reference
(ClusterTransformation + EnforceSimilarity, util.cpp:1232-1277): connected
components of the "translation within tol AND Euler distance within tol"
graph, representative = smallest member index, ranked by size.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plade_tpu.geometry.transforms import euler_angles
from plade_tpu.match import matching


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def _brute_single_linkage(t, e, valid, dist_tol, euler_tol):
    """Reference implementation: union-find over the pairwise graph.
    Returns a list of member-index sets."""
    H = len(t)
    parent = list(range(H))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(H):
        if not valid[i]:
            continue
        for j in range(i + 1, H):
            if not valid[j]:
                continue
            if (np.linalg.norm(t[i] - t[j]) <= dist_tol
                    and np.sum((e[i] - e[j]) ** 2) < euler_tol ** 2):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    roots = {}
    for i in range(H):
        if valid[i]:
            roots.setdefault(find(i), set()).add(i)
    return list(roots.values())


def test_cluster_chain_merges_across_any_boundary():
    """A chain of poses, each within tol of the next but spanning many
    multiples of tol end-to-end, must form ONE cluster (this is exactly
    what grid binning at the tolerance gets wrong: the chain straddles
    every bin boundary)."""
    n = 12
    dist_tol = 0.1
    euler_tol = 0.15
    t = np.zeros((n, 3), np.float32)
    t[:, 0] = np.arange(n) * 0.09          # straddles 0.1-wide bins
    R = np.stack([_rot_z(0.001 * i) for i in range(n)])
    valid = np.ones(n, bool)
    cl = matching.cluster_poses(jnp.asarray(R), jnp.asarray(t),
                                jnp.asarray(valid), dist_tol, euler_tol,
                                max_clusters=8)
    sizes = np.asarray(cl.size)[np.asarray(cl.valid)]
    reps = np.asarray(cl.rep)[np.asarray(cl.valid)]
    assert sizes.tolist() == [n]
    # representative = member nearest the centroid (the chain's middle)
    assert abs(int(reps[0]) - n // 2) <= 1


def test_cluster_split_on_gap():
    """Two clumps separated by more than tol in translation stay apart,
    and a rotation gap alone also splits (the Euler condition)."""
    dist_tol = 0.1
    euler_tol = 0.1
    t = np.array([[0, 0, 0], [0.05, 0, 0],        # clump A
                  [1.0, 0, 0], [1.04, 0, 0],       # clump B (far)
                  [0.02, 0, 0]], np.float32)       # near A but rotated far
    R = np.stack([_rot_z(0.0), _rot_z(0.01), _rot_z(0.0), _rot_z(0.01),
                  _rot_z(0.5)])
    valid = np.ones(5, bool)
    cl = matching.cluster_poses(jnp.asarray(R), jnp.asarray(t),
                                jnp.asarray(valid), dist_tol, euler_tol,
                                max_clusters=8)
    got = [(int(r), int(s)) for r, s, v in
           zip(np.asarray(cl.rep), np.asarray(cl.size), np.asarray(cl.valid))
           if v]
    comps = {frozenset({0, 1}): 2, frozenset({2, 3}): 2, frozenset({4}): 1}
    assert len(got) == 3
    for r, s in got:
        comp = next(c for c in comps if r in c)
        assert comps.pop(comp) == s


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cluster_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    H = 64
    t = rng.uniform(-0.5, 0.5, size=(H, 3)).astype(np.float32)
    R = np.stack([_rot_z(a) for a in rng.uniform(-0.3, 0.3, size=H)])
    valid = rng.uniform(size=H) < 0.8
    dist_tol, euler_tol = 0.12, 0.2
    e = np.stack(
        [np.asarray(x) for x in euler_angles(jnp.asarray(R))], axis=-1)
    comps = _brute_single_linkage(t, e, valid, dist_tol, euler_tol)
    cl = matching.cluster_poses(jnp.asarray(R), jnp.asarray(t),
                                jnp.asarray(valid), dist_tol, euler_tol,
                                max_clusters=H, chunk=16)
    got = [(int(r), int(s)) for r, s, v in
           zip(np.asarray(cl.rep), np.asarray(cl.size), np.asarray(cl.valid))
           if v]
    assert len(got) == len(comps)
    remaining = {frozenset(c) for c in comps}
    for r, s in got:
        comp = next(c for c in remaining if r in c)  # rep is a member
        assert len(comp) == s
        remaining.remove(comp)


def test_match_descriptors_radius_exact():
    """Every (query, target) pair within the radius is returned, none
    outside (the reference search is exact fixed-radius, util.cpp:115)."""
    rng = np.random.default_rng(0)
    Q, T = 64, 128
    qd = rng.normal(size=(Q, 8)).astype(np.float32)
    td = rng.normal(size=(T, 8)).astype(np.float32)
    radius = 0.8

    from plade_tpu.core.types import PairDescriptors

    def mk(d):
        n = d.shape[0]
        z = jnp.zeros((n, 3), jnp.float32)
        return PairDescriptors(desc=jnp.asarray(d), line_vec1=z, line_vec2=z,
                               anchor=z,
                               line_idx=jnp.zeros((n, 2), jnp.int32),
                               count=jnp.asarray(n, jnp.int32))

    m = matching.match_descriptors(mk(qd), mk(td), radius, max_matches=4096)
    got = {(int(q), int(ti)) for q, ti, v in
           zip(np.asarray(m.q_idx), np.asarray(m.t_idx),
               np.asarray(m.valid)) if v}
    d = np.linalg.norm(qd[:, None] - td[None, :], axis=-1)
    want = {(i, j) for i in range(Q) for j in range(T)
            if d[i, j] <= radius}
    assert got == want
