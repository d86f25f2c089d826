"""verify/ tests: overlap scoring vs exact numpy; penetration filter on
constructed penetrating / non-penetrating configurations."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from plade_tpu.verify import overlap as overlap_mod
from plade_tpu.verify import penetration


def _pad(pts, n):
    out = np.full((n, 3), 1e8, np.float32)
    out[:len(pts)] = pts
    return jnp.asarray(out)


def test_overlap_scores_match_numpy(rng):
    S, T = 500, 600
    src = rng.normal(size=(S, 3)).astype(np.float32)
    tgt = rng.normal(size=(T, 3)).astype(np.float32)
    r = 0.25
    C = 3
    Rs, ts = [], []
    for k in range(C):
        th = rng.uniform(0, 2 * np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0],
                      [0, 0, 1]], np.float32)
        Rs.append(R)
        ts.append(rng.normal(scale=0.1, size=3).astype(np.float32))
    Rs = jnp.asarray(np.stack(Rs))
    ts = jnp.asarray(np.stack(ts))
    ov = overlap_mod.overlap_scores(
        Rs, ts, jnp.ones(C, bool), _pad(src, 512), jnp.asarray(S),
        _pad(tgt, 1024), jnp.asarray(T), jnp.float32(r),
        plane_frac=jnp.zeros(C), face_weight=0.2, exact_k=C, grid=64)
    for k in range(C):
        q = src @ np.asarray(Rs[k]).T + np.asarray(ts[k])
        d2 = ((q[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
        expect = (d2.min(1) <= r * r).sum() / min(S, T)
        np.testing.assert_allclose(float(ov[k]), expect, atol=1e-5)


def test_oriented_overlap_rejects_replica_alias(rng):
    """Repetitive-structure aliasing: candidate B lands the source on a
    geometry replica whose surface ORIENTATION differs.  Position-only
    overlap (normal_cos=0, the reference semantics) scores both candidates
    ~1.0; oriented overlap keeps the true pose's score and deflates the
    replica's."""
    n = 400
    src = np.zeros((n, 3), np.float32)
    src[:, :2] = rng.uniform(0, 1, size=(n, 2))
    src_n = np.tile(np.array([0, 0, 1], np.float32), (n, 1))
    # target: the same patch at the origin (normals +z) plus a positional
    # replica at x+10 whose normals point +x instead
    tgt = np.concatenate([src, src + np.array([10, 0, 0], np.float32)])
    tgt_n = np.concatenate([src_n,
                            np.tile(np.array([1, 0, 0], np.float32), (n, 1))])
    Rs = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * 2))
    ts = jnp.asarray(np.array([[0, 0, 0], [10, 0, 0]], np.float32))

    def pad_n(nrm, size):
        out = np.zeros((size, 3), np.float32)
        out[:len(nrm)] = nrm
        return jnp.asarray(out)

    common = dict(plane_frac=jnp.zeros(2), face_weight=0.0, exact_k=2,
                  grid=128)
    ov_plain = overlap_mod.overlap_scores(
        Rs, ts, jnp.ones(2, bool), _pad(src, 512), jnp.asarray(n),
        _pad(tgt, 1024), jnp.asarray(2 * n), jnp.float32(0.05), **common)
    ov_orient = overlap_mod.overlap_scores(
        Rs, ts, jnp.ones(2, bool), _pad(src, 512), jnp.asarray(n),
        _pad(tgt, 1024), jnp.asarray(2 * n), jnp.float32(0.05),
        src_normals=pad_n(src_n, 512), tgt_normals=pad_n(tgt_n, 1024),
        normal_cos=0.7071, **common)
    # plain: both perfect (denominator min(|src|,|tgt|) = n)
    assert float(ov_plain[0]) == 1.0 and float(ov_plain[1]) == 1.0
    # oriented: true pose keeps 1.0, replica drops to 0
    assert float(ov_orient[0]) == 1.0
    assert float(ov_orient[1]) == 0.0


def test_overlap_bound_loop_recovers_misordered_winner():
    """Adversarial phase-1 ranking: candidate A's dilated-bitmap count is
    inflated (every transformed point lands in a dilated cell but outside
    the exact radius) and its plane fraction pushes its *bound* above the
    true winner B's.  With exact_k=1, a fixed top-K scheme would evaluate
    only A and zero B's overlap, flipping the caller's argmax; the bound
    loop must expand until B's exact score is known."""
    n = 8
    tgt = np.stack([np.arange(n, dtype=np.float32),
                    np.zeros(n, np.float32),
                    np.zeros(n, np.float32)], axis=1)  # spacing 1.0
    src = tgt.copy()
    r = 0.1
    # B: identity -> exact overlap 1.0.  A: shift 0.15 along x -> each point
    # sits in the cell adjacent to a target point (dilated test passes) but
    # 0.15 > r away (exact test fails) -> approx 1.0, exact 0.0.
    Rs = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * 2))
    ts = jnp.asarray(np.array([[0.15, 0.0, 0.0],
                               [0.0, 0.0, 0.0]], np.float32))
    pf = jnp.asarray([0.6, 0.0], jnp.float32)
    fw = 0.5
    # bounds: A = .5*.6 + .5*1.0 = 0.8 > B = 0.5 -> A ranked first
    # exact:  A = .5*.6 + 0      = 0.3 < B = 0.5 -> B is the true winner
    ov = overlap_mod.overlap_scores(
        Rs, ts, jnp.ones(2, bool), _pad(src, 16), jnp.asarray(n),
        _pad(tgt, 16), jnp.asarray(n), jnp.float32(r),
        plane_frac=pf, face_weight=fw, exact_k=1, grid=128)
    score = fw * np.asarray(pf) + (1 - fw) * np.asarray(ov)
    assert np.asarray(ov)[1] == 1.0          # B's exact overlap was computed
    assert int(np.argmax(score)) == 1        # and B wins the final argmax


def test_overlap_bound_loop_stops_early():
    """When the top-ranked candidate's exact score already meets the next
    bound, only one chunk is evaluated (the common case): remaining
    candidates keep overlap 0."""
    n = 8
    tgt = np.stack([np.arange(n, dtype=np.float32),
                    np.zeros(n, np.float32),
                    np.zeros(n, np.float32)], axis=1)
    src = tgt.copy()
    Rs = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * 3))
    ts = jnp.asarray(np.array([[0.0, 0.0, 0.0],
                               [0.0, 5.0, 0.0],
                               [0.0, -5.0, 0.0]], np.float32))
    ov = overlap_mod.overlap_scores(
        Rs, ts, jnp.ones(3, bool), _pad(src, 16), jnp.asarray(n),
        _pad(tgt, 16), jnp.asarray(n), jnp.float32(0.1),
        plane_frac=jnp.zeros(3), face_weight=0.2, exact_k=1, grid=128)
    assert float(ov[0]) == 1.0
    assert float(ov[1]) == 0.0 and float(ov[2]) == 0.0


def _plane_cloud(rng, n, axis_u, axis_v, center, half, z_sigma=0.0):
    uv = rng.uniform(-half, half, size=(n, 2)).astype(np.float32)
    pts = center + uv[:, :1] * axis_u + uv[:, 1:2] * axis_v
    return pts.astype(np.float32)


def _quad(center, axis_u, axis_v, half):
    c = np.asarray(center, np.float32)
    return np.stack([c - half * axis_u - half * axis_v,
                     c + half * axis_u - half * axis_v,
                     c + half * axis_u + half * axis_v,
                     c - half * axis_u + half * axis_v])


def _run_penetration(src_pts, src_plane, src_corners,
                     tgt_pts, tgt_plane, tgt_corners, lt):
    """One candidate (identity pose), one source plane, one target plane."""
    M = 2048
    R = jnp.eye(3)[None]
    t = jnp.zeros((1, 3))
    valid = jnp.ones(1, bool)
    sc = jnp.asarray(src_plane, jnp.float32)[None]
    tc = jnp.asarray(tgt_plane, jnp.float32)[None]
    scorn = jnp.asarray(src_corners, jnp.float32)[None]
    tcorn = jnp.asarray(tgt_corners, jnp.float32)[None]
    scent = jnp.mean(scorn, axis=1)
    tcent = jnp.mean(tcorn, axis=1)
    tests = penetration.build_tests(
        R, t, valid, sc, scorn, scent, jnp.ones(1, bool),
        tc, tcorn, tcent, jnp.ones(1, bool),
        jnp.float32(lt), 5.0 / 180.0 * math.pi, max_tests=16)
    spts = jnp.asarray(np.stack([np.pad(
        src_pts, ((0, M - len(src_pts)), (0, 0)), constant_values=1e8)]))
    tpts = jnp.asarray(np.stack([np.pad(
        tgt_pts, ((0, M - len(tgt_pts)), (0, 0)), constant_values=1e8)]))
    pen = penetration.run_tests(
        tests, R, t, spts, jnp.asarray([len(src_pts)]),
        tpts, jnp.asarray([len(tgt_pts)]), sc, tc,
        search_radius=jnp.float32(lt), min_points=10,
        min_distance=jnp.float32(lt) / 2.0, n_samples=32)
    rejected = penetration.rejected_candidates(tests, pen, 1)
    return bool(rejected[0]), int(np.asarray(tests.valid).sum())


def test_crossing_planes_penetrate(rng):
    # source plane z=0 crosses target plane x=0 through both quads' middles
    ex, ey, ez = np.eye(3, dtype=np.float32)
    src_pts = _plane_cloud(rng, 2000, ex, ey, np.zeros(3), 1.0)
    tgt_pts = _plane_cloud(rng, 2000, ey, ez, np.zeros(3), 1.0)
    rej, ntests = _run_penetration(
        src_pts, [0, 0, 1, 0], _quad([0, 0, 0], ex, ey, 1.0),
        tgt_pts, [1, 0, 0, 0], _quad([0, 0, 0], ey, ez, 1.0), lt=0.1)
    assert ntests >= 1
    assert rej  # both sides populated beyond min_distance -> penetrable


def test_touching_planes_do_not_penetrate(rng):
    # source plane z=0 spans x in [0, 2]: touches target plane x=0 at its
    # edge — target side has points only on one side of the source plane?
    # no: construct source entirely on x>0 so its points sit on ONE side
    # of the target plane -> side-1 counts fail -> not penetrable
    ex, ey, ez = np.eye(3, dtype=np.float32)
    src_pts = _plane_cloud(rng, 2000, ex, ey, np.array([1.1, 0, 0]), 1.0)
    tgt_pts = _plane_cloud(rng, 2000, ey, ez, np.zeros(3), 1.0)
    rej, _ = _run_penetration(
        src_pts, [0, 0, 1, 0], _quad([1.1, 0, 0], ex, ey, 1.0),
        tgt_pts, [1, 0, 0, 0], _quad([0, 0, 0], ey, ez, 1.0), lt=0.1)
    assert not rej


def test_penetration_overflow_detected(rng):
    """Plane-rich stress: many crossing plane pairs across many candidates
    overflow a tiny test budget — the overflow counter must report exactly
    the dropped triples instead of silently truncating (VERDICT r3 weak
    #3; the reference's loop is unbounded, util.cpp:450-511)."""
    ex, ey, ez = np.eye(3, dtype=np.float32)
    P = 6
    C = 4
    # P source planes z=k*0.01 crossing P target planes x=k*0.01 — every
    # (src, tgt) pair needs a point test, for every candidate
    sc = jnp.asarray([[0, 0, 1, -0.01 * k] for k in range(P)], jnp.float32)
    tc = jnp.asarray([[1, 0, 0, -0.01 * k] for k in range(P)], jnp.float32)
    scorn = jnp.asarray(np.stack(
        [_quad([0, 0, 0.01 * k], ex, ey, 1.0) for k in range(P)]))
    tcorn = jnp.asarray(np.stack(
        [_quad([0.01 * k, 0, 0], ey, ez, 1.0) for k in range(P)]))
    R = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * C))
    t = jnp.zeros((C, 3))
    budget = 8
    tests = penetration.build_tests(
        R, t, jnp.ones(C, bool), sc, scorn, jnp.mean(scorn, 1),
        jnp.ones(P, bool), tc, tcorn, jnp.mean(tcorn, 1), jnp.ones(P, bool),
        jnp.float32(0.1), 5.0 / 180.0 * math.pi, max_tests=budget)
    n_need = C * P * P  # every triple crosses
    assert int(np.asarray(tests.valid).sum()) == budget
    assert int(tests.overflow) == n_need - budget
    # a generous budget reports zero overflow
    tests2 = penetration.build_tests(
        R, t, jnp.ones(C, bool), sc, scorn, jnp.mean(scorn, 1),
        jnp.ones(P, bool), tc, tcorn, jnp.mean(tcorn, 1), jnp.ones(P, bool),
        jnp.float32(0.1), 5.0 / 180.0 * math.pi, max_tests=256)
    assert int(tests2.overflow) == 0


def test_far_planes_produce_no_tests(rng):
    ex, ey, ez = np.eye(3, dtype=np.float32)
    src_pts = _plane_cloud(rng, 200, ex, ey, np.array([10.0, 0, 0]), 0.5)
    tgt_pts = _plane_cloud(rng, 200, ey, ez, np.zeros(3), 0.5)
    rej, ntests = _run_penetration(
        src_pts, [0, 0, 1, 0], _quad([10.0, 0, 0], ex, ey, 0.5),
        tgt_pts, [1, 0, 0, 0], _quad([0, 0, 0], ey, ez, 0.5), lt=0.1)
    assert ntests == 0 and not rej


def test_penetration_tier_parity(rng):
    """The small-plane tier (sliced point buffers) and the full-buffer
    tier are two lowerings of one test: verdicts must agree whichever
    tier a test lands in.  Mixed case: one small-plane crossing pair and
    one big-plane crossing pair in the same run."""
    ex, ey, ez = np.eye(3, dtype=np.float32)
    M = 2048
    R = jnp.eye(3)[None]
    t = jnp.zeros((1, 3))
    # plane 0: small (300 pts), plane 1: big (1500 pts), both crossing an
    # equally-sized target plane
    src_clouds = [_plane_cloud(rng, 300, ex, ey, np.zeros(3), 1.0),
                  _plane_cloud(rng, 1500, ex, ey, np.array([0, 0, 5.0]),
                               1.0)]
    tgt_clouds = [_plane_cloud(rng, 300, ey, ez, np.zeros(3), 1.0),
                  _plane_cloud(rng, 1500, ey, ez, np.array([0, 0, 5.0]),
                               1.0)]
    sc = jnp.asarray([[0, 0, 1, 0], [0, 0, 1, -5.0]], jnp.float32)
    tc = jnp.asarray([[1, 0, 0, 0], [1, 0, 0, 0]], jnp.float32)
    scorn = jnp.asarray(np.stack([
        _quad([0, 0, 0], ex, ey, 1.0), _quad([0, 0, 5.0], ex, ey, 1.0)]))
    tcorn = jnp.asarray(np.stack([
        _quad([0, 0, 0], ey, ez, 1.0), _quad([0, 0, 5.0], ey, ez, 1.0)]))
    scent = jnp.mean(scorn, axis=1)
    tcent = jnp.mean(tcorn, axis=1)
    tests = penetration.build_tests(
        R, t, jnp.ones(1, bool), sc, scorn, scent, jnp.ones(2, bool),
        tc, tcorn, tcent, jnp.ones(2, bool),
        jnp.float32(0.1), 5.0 / 180.0 * math.pi, max_tests=16)

    def padc(c):
        return np.pad(c, ((0, M - len(c)), (0, 0)), constant_values=1e8)

    spts = jnp.asarray(np.stack([padc(c) for c in src_clouds]))
    tpts = jnp.asarray(np.stack([padc(c) for c in tgt_clouds]))
    scnt = jnp.asarray([len(c) for c in src_clouds])
    tcnt = jnp.asarray([len(c) for c in tgt_clouds])
    kw = dict(search_radius=jnp.float32(0.1), min_points=10,
              min_distance=jnp.float32(0.05), n_samples=32)
    # two-tier (default small_points=512: plane 0 small, plane 1 big)
    pen2 = penetration.run_tests(tests, R, t, spts, scnt, tpts, tcnt,
                                 sc, tc, **kw)
    # single-tier (small_points >= M: everything in the big tier)
    pen1 = penetration.run_tests(tests, R, t, spts, scnt, tpts, tcnt,
                                 sc, tc, small_points=M, **kw)
    v = np.asarray(tests.valid)
    np.testing.assert_array_equal(np.asarray(pen2)[v], np.asarray(pen1)[v])
    # both crossing pairs penetrate
    rej = penetration.rejected_candidates(tests, pen2, 1)
    assert bool(rej[0])
