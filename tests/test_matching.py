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


def _mk_desc(d):
    from plade_tpu.core.types import PairDescriptors
    n = d.shape[0]
    z = jnp.zeros((n, 3), jnp.float32)
    return PairDescriptors(desc=jnp.asarray(d), line_vec1=z, line_vec2=z,
                           anchor=z, line_idx=jnp.zeros((n, 2), jnp.int32),
                           count=jnp.asarray(n, jnp.int32))


def test_match_saturation_counter_exact():
    """``saturated`` counts exactly the query rows that kept fewer radius
    hits than truly exist (the per-query cap path — the reference search
    is unbounded-k, util.cpp:115), and zero saturation certifies
    radius-exactness."""
    rng = np.random.default_rng(1)
    # query 0 sits in a dense clump of 20 targets within radius; query 1
    # has 2 neighbors; the rest none
    qd = np.array([[0.0] * 8, [5.0] * 8, [50.0] * 8], np.float32)
    clump = (qd[0] + rng.normal(scale=0.005, size=(20, 8))).astype(np.float32)
    near1 = (qd[1] + rng.normal(scale=0.005, size=(2, 8))).astype(np.float32)
    far = rng.normal(loc=-40.0, size=(30, 8)).astype(np.float32)
    td = np.concatenate([clump, near1, far])
    radius = 0.1

    # cap 8 < 20 true hits on row 0 -> exactly one saturated row, and the
    # kept matches for row 0 are the 8 NEAREST clump members
    m = matching.match_descriptors(_mk_desc(qd), _mk_desc(td), radius,
                                   max_matches=256, per_query=8)
    assert int(m.saturated) == 1
    got0 = sorted(int(t) for q, t, v in zip(np.asarray(m.q_idx),
                                            np.asarray(m.t_idx),
                                            np.asarray(m.valid))
                  if v and int(q) == 0)
    d0 = np.linalg.norm(qd[0] - td, axis=-1)
    want0 = sorted(np.argsort(d0)[:8].tolist())
    assert got0 == want0
    # row 1's 2 hits are all kept despite the cap
    got1 = {int(t) for q, t, v in zip(np.asarray(m.q_idx),
                                      np.asarray(m.t_idx),
                                      np.asarray(m.valid))
            if v and int(q) == 1}
    assert got1 == {20, 21}

    # cap 32 >= every row's true hit count -> zero saturation, exact set
    m2 = matching.match_descriptors(_mk_desc(qd), _mk_desc(td), radius,
                                    max_matches=256, per_query=32)
    assert int(m2.saturated) == 0
    assert int(m2.count) == 22


def test_stitch_hypotheses_front_compacts():
    """Segments with internally front-compacted valid rows stitch into one
    prefix — the property cluster_poses' tier dispatch relies on (without
    it, degraded-family hypotheses parked behind the 2-2 buffer's invalid
    tail are silently dropped whenever the total count fits a tier)."""
    def seg(m, c, base):
        R = jnp.tile(jnp.eye(3)[None] * 0.0, (m, 1, 1)).at[:, 0, 0].set(
            base + jnp.arange(m, dtype=jnp.float32))
        t = jnp.zeros((m, 3)).at[:, 0].set(
            base + jnp.arange(m, dtype=jnp.float32))
        return R, t, jnp.asarray(c, jnp.int32)

    s0 = seg(8, 2, 100.0)    # valid rows 100, 101
    s1 = seg(4, 3, 200.0)    # valid rows 200, 201, 202
    s2 = seg(4, 1, 300.0)    # valid row  300
    R, t, valid, total = matching.stitch_hypotheses([s0, s1, s2])
    assert R.shape == (16, 3, 3) and int(total) == 6
    assert np.asarray(valid).tolist() == [True] * 6 + [False] * 10
    assert np.asarray(t)[:6, 0].tolist() == [100.0, 101.0, 200.0, 201.0,
                                             202.0, 300.0]
    # count saturating a segment's buffer clamps to the buffer size
    s3 = seg(4, 99, 400.0)
    _, t2, _, total2 = matching.stitch_hypotheses([s0, s3])
    assert int(total2) == 6
    assert np.asarray(t2)[:6, 0].tolist() == [100.0, 101.0, 400.0, 401.0,
                                              402.0, 403.0]


def test_degraded_families_recover_missing_plane_match():
    """Feature-flag surface (VERDICT r3 next-#8): when one cloud's support
    plane is corrupted (stand-in for an unextracted plane), the 2-2 8-D
    match for the affected line pair disappears — but the 22-12 degraded
    6-D family, which replaces the broken plane with the lineVec x plane
    pseudo-plane (util.cpp:830-919), still matches and its hypothesis
    recovers the identity pose.  The default 2-2 path is a separate code
    path and is untouched by the flag."""
    import math

    from plade_tpu.core.types import LineSet
    from plade_tpu.descriptors.pairlines import (degraded_descriptors,
                                                 pair_descriptors)

    # four planes: z=0, x=0, y=0, tilted; two lines A=(0,1), B=(2,3)
    ez = np.array([0, 0, 1], np.float32)
    ex = np.array([1, 0, 0], np.float32)
    ey = np.array([0, 1, 0], np.float32)
    nt = np.array([1, 1, 1], np.float32) / np.sqrt(3)
    normals = np.stack([ez, ex, ey, nt])

    def unit(v):
        return v / np.linalg.norm(v)

    # line A: intersection of planes 0,1 -> direction ez x ex = ey... use
    # cross of normals
    uA = unit(np.cross(ez, ex))
    uB = unit(np.cross(ey, nt))
    L = 8
    direction = np.zeros((L, 3), np.float32)
    point = np.full((L, 3), 1e8, np.float32)
    support = np.zeros((L, 2), np.int32)
    direction[0] = uA
    point[0] = 0.0
    support[0] = (0, 1)
    direction[1] = uB
    point[1] = (0.0, 0.0, 0.0)
    support[1] = (2, 3)
    lines = LineSet(direction=jnp.asarray(direction),
                    point=jnp.asarray(point),
                    support=jnp.asarray(support),
                    count=jnp.asarray(2, jnp.int32))

    scale = jnp.float32(1.0)
    cos10 = math.cos(math.radians(10.0))
    kw = dict(min_angle_cos=cos10)
    tgt8 = pair_descriptors(lines, jnp.asarray(normals), scale, 16,
                            ordered=True, pad_value=-1e6, **kw)

    # corrupted source: plane 1's normal rotated 30 degrees
    bad = normals.copy()
    bad[1] = unit(np.array([np.cos(np.radians(30)), 0,
                            np.sin(np.radians(30))], np.float32))
    src8 = pair_descriptors(lines, jnp.asarray(bad), scale, 16,
                            ordered=False, pad_value=1e6, **kw)
    m22 = matching.match_descriptors(src8, tgt8, 0.04, 64)
    assert int(m22.count) == 0  # the broken plane kills the 2-2 match

    # degraded 22-12 family: line1 (= A, the corrupted-plane line) keeps
    # only its good plane
    tgt6 = degraded_descriptors(lines, jnp.asarray(normals), scale, 16,
                                ordered=True, family="2212",
                                pad_value=-1e6, **kw)
    src6 = degraded_descriptors(lines, jnp.asarray(bad), scale, 16,
                                ordered=False, family="2212",
                                pad_value=1e6, **kw)
    m6 = matching.match_descriptors(src6, tgt6, 0.04, 64)
    assert int(m6.count) > 0  # the degraded probe recovers the pair

    R6, t6 = matching.hypothesis_poses(src6, tgt6, m6)
    ok = np.asarray(m6.valid)
    R6 = np.asarray(R6)[ok]
    t6 = np.asarray(t6)[ok]
    # identity pose among the recovered hypotheses
    errs = [np.degrees(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))
            for r in R6]
    assert min(errs) < 1.0 and np.linalg.norm(t6[int(np.argmin(errs))]) < 1e-3
