"""End-to-end registration on synthetic scenes with known rigid transforms."""
import numpy as np
import pytest

from plade_tpu.core.config import PladeConfig
from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud
from plade_tpu.pipeline import register_clouds

SMALL_CFG = PladeConfig(
    ransac_candidates_per_round=64,
    ransac_init_min_support=2000,
    ransac_min_allowed_support=200,
    min_planes=6,
    max_planes=12,
    bitmap_grid=64,
    bitmap_cc_iters=48,
    spacing_samples=2000,
    max_ds_points=4096,
    max_plane_points=1024,
    max_lines=128,
    max_query_pairs=2048,
    max_target_pairs=4096,
    max_matches=8192,
    max_pose_clusters=512,
    max_candidate_results=64,
    max_penetration_tests=1024,
)


def rotation_error_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))


@pytest.mark.parametrize("seed", [0, 1])
def test_register_synthetic_room(seed):
    rng = np.random.default_rng(seed)
    pts, nrm, _ = make_room(rng, n_per_plane=1400, noise=0.003,
                            extra_planes=3)
    R_gt, t_gt = random_rigid(rng, max_angle=2.5, max_trans=1.5)
    # source = room transformed by the INVERSE: registering source->target
    # must recover (R_gt, t_gt)
    Rinv = R_gt.T
    tinv = -R_gt.T @ t_gt
    src_pts, src_nrm = transform_cloud(pts, nrm, Rinv, tinv)
    # independent resampling noise on the source
    src_pts = src_pts + rng.normal(scale=0.002, size=src_pts.shape).astype(np.float32)

    T, info = register_clouds(pts, nrm, src_pts, src_nrm, SMALL_CFG,
                              seed=seed)
    assert info.get("success"), info
    R_est = T[:3, :3]
    t_est = T[:3, 3]
    assert rotation_error_deg(R_est, R_gt) < 3.0, (T, R_gt, t_gt, info)
    assert np.linalg.norm(t_est - t_gt) < 0.12, (T, t_gt, info)


def test_register_identity_pair():
    rng = np.random.default_rng(3)
    pts, nrm, _ = make_room(rng, n_per_plane=1200, noise=0.002,
                            extra_planes=2)
    pts2 = pts + rng.normal(scale=0.002, size=pts.shape).astype(np.float32)
    T, info = register_clouds(pts, nrm, pts2, nrm, SMALL_CFG, seed=0)
    assert info.get("success"), info
    assert rotation_error_deg(T[:3, :3], np.eye(3)) < 2.0
    assert np.linalg.norm(T[:3, 3]) < 0.1
    assert info["overlap"] > 0.5


def test_register_clouds_explicit_min_support(rng):
    """Explicit-min-support overload parity (plade.cpp:583-599)."""
    from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud
    from plade_tpu.pipeline import register_clouds
    pts, nrm, _ = make_room(rng, n_per_plane=1200, noise=0.002,
                            extra_planes=2)
    R, t = random_rigid(rng, max_angle=1.0, max_trans=0.5)
    spts, snrm = transform_cloud(pts, nrm, R.T, -R.T @ t)
    T, info = register_clouds(pts, nrm, spts, snrm, SMALL_CFG, seed=0,
                              ransac_min_support=(400, 400))
    assert info["success"], info
    c = (np.trace(R.T @ T[:3, :3]) - 1) / 2
    assert np.degrees(np.arccos(np.clip(c, -1, 1))) < 3.0


def test_register_small_overlap(rng):
    """The headline PLADE scenario: two partial scans sharing only part of
    the scene (paper title: registration with SMALL overlap).

    The scene is an *open* scan — floor + two walls + tilted interior
    planes — not a closed box: a closed symmetric box admits 180-degree
    poses that explain the data almost as well as the truth (5 consistent
    planes, overlap > 1.0 measured), which is the C++ reference's own
    documented failure mode (BASELINE.md: 3/10 polyhedron runs lock a
    symmetric wrong pose) and not a property any registration pipeline can
    resolve from geometry alone.  Real terrestrial scans never see every
    face of a room."""
    from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud
    from plade_tpu.pipeline import register_clouds
    pts, nrm, _ = make_room(rng, n_per_plane=2000, noise=0.002,
                            extra_planes=6,
                            faces=("floor", "wall_y-", "wall_x+"))
    # split along x with an overlap band: each side keeps ~65% of the scene
    lo, hi = np.quantile(pts[:, 0], [0.35, 0.65])
    tgt_sel = pts[:, 0] <= hi
    src_sel = pts[:, 0] >= lo
    tpts, tnrm = pts[tgt_sel], nrm[tgt_sel]
    spts0, snrm0 = pts[src_sel], nrm[src_sel]
    R, t = random_rigid(rng, max_angle=1.0, max_trans=0.5)
    spts, snrm = transform_cloud(spts0, snrm0, R.T, -R.T @ t)
    T, info = register_clouds(tpts, tnrm, spts, snrm, SMALL_CFG, seed=0)
    assert info["success"], info
    c = (np.trace(R.T @ T[:3, :3]) - 1) / 2
    rot_err = np.degrees(np.arccos(np.clip(c, -1, 1)))
    assert rot_err < 3.0, (rot_err, info)
    assert np.linalg.norm(T[:3, 3] - t) < 0.15, info


def test_line_confidence_gate(rng):
    """min_line_confidence culls the spurious virtual line of two planes
    whose supports are far apart, and keeps real near-support lines
    (plade.cpp:144-162; the reference computes this confidence but ships
    with the cull commented out, so the default 0.0 keeps every line)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from plade_tpu.core.types import pad_cloud
    from plade_tpu.extract import ransac
    from plade_tpu.io.synthetic import make_plane_points
    from plade_tpu.knn.bruteforce import average_spacing
    from plade_tpu.pipeline import (_line_confidence, _pad_size,
                                    prepare_cloud)

    # floor + wall share an edge (high confidence); a small tilted plane
    # well above the floor makes a floor-intersection line ~1 unit from
    # its own support (low confidence)
    p1, n1 = make_plane_points(rng, (0, 0, 0), (1, 0, 0), (0, 1, 0),
                               2.0, 2.0, 3000, noise=0.002)
    p2, n2 = make_plane_points(rng, (-2, 0, 1), (0, 1, 0), (0, 0, 1),
                               2.0, 1.0, 3000, noise=0.002)
    tilt = np.radians(35.0)
    u3 = (np.cos(tilt), 0, np.sin(tilt))
    p3, n3 = make_plane_points(rng, (0.2, 1.2, 1.0), u3, (0, 1, 0),
                               0.7, 0.7, 1500, noise=0.002)
    pts = np.concatenate([p1, p2, p3])
    nrm = np.concatenate([n1, n2, n3])

    cfg = SMALL_CFG
    pad = _pad_size(pts.shape[0])
    cloud = pad_cloud(pts, nrm, pad)
    planes = ransac.auto_extract(cloud.points, cloud.normals, cloud.count,
                                 jax.random.PRNGKey(0), cfg, pad)
    assert int(planes.count) == 3
    sp = float(average_spacing(cloud.points, cloud.mask, cfg.spacing_k,
                               cfg.spacing_samples))
    dsd = jnp.float32(cfg.downsample_factor * sp)
    prep = prepare_cloud(cloud, planes, dsd, cfg)
    n_lines = int(prep.lines.count)
    assert n_lines == 3          # all three plane pairs intersect
    conf = np.asarray(_line_confidence(prep.lines, prep.geom, dsd, cfg))
    sup = np.asarray(prep.lines.support)[:n_lines]
    # the small tilted plane (fewest support points): every line through
    # it lies ~1+ unit from its support (virtual intersections), while the
    # floor-wall edge line touches both supports
    tilted = int(np.argmin(np.asarray(planes.sizes)[:3]))
    is_far = np.array([tilted in (a, b) for a, b in sup])
    assert is_far.sum() == 2
    far_confs = conf[:n_lines][is_far]
    good_conf = conf[:n_lines][~is_far][0]
    assert far_confs.max() < good_conf / 4, (conf, sup)

    thresh = float(np.sqrt(far_confs.max() * good_conf))
    gated = dataclasses.replace(cfg, min_line_confidence=thresh)
    prep2 = prepare_cloud(cloud, planes, dsd, gated)
    assert int(prep2.lines.count) == 1
    sup2 = np.asarray(prep2.lines.support)[:1]
    assert tilted not in sup2[0]


def test_degraded_families_full_pipeline(rng):
    """Integration of the enable_degraded_families flag through the FULL
    pipeline: the stitched hypothesis buffer (2-2 + two degraded 6-D
    segments) must reach pose clustering front-compacted — with the raw
    concatenation the tier dispatch in cluster_poses dropped every
    degraded hypothesis whenever the total count fit a tier (advisor r4
    medium), and the success gate ignored degraded-only matches."""
    import dataclasses
    pts, nrm, _ = make_room(rng, n_per_plane=1200, noise=0.002,
                            extra_planes=2)
    R, t = random_rigid(rng, max_angle=1.0, max_trans=0.5)
    spts, snrm = transform_cloud(pts, nrm, R.T, -R.T @ t)
    cfg = dataclasses.replace(SMALL_CFG, enable_degraded_families=True,
                              max_degraded_matches=2048)
    T, info = register_clouds(pts, nrm, spts, snrm, cfg, seed=0)
    assert info["success"], info
    c = (np.trace(R.T @ T[:3, :3]) - 1) / 2
    assert np.degrees(np.arccos(np.clip(c, -1, 1))) < 3.0


def test_rescore_reporting_matches_ranking_quantity(rng):
    """When the tight-radius rescore selects the winner, the returned
    transform must be the re-centered pose that was RANKED, and
    info['score'] / info['overlap'] must equal the tight co-visible
    quantities that ranked it — not the stale coarse entries (which are 0
    for candidates the bound loop never exactly evaluated).  Verified by
    recomputing the rescore score of the RETURNED pose independently."""
    import jax
    import jax.numpy as jnp
    from plade_tpu.core.types import pad_cloud
    from plade_tpu.extract import ransac
    from plade_tpu.knn.bruteforce import average_spacing
    from plade_tpu.pipeline import (_pad_size, prepare_cloud,
                                    register_with_planes)
    from plade_tpu.verify import overlap as overlap_mod

    cfg = SMALL_CFG
    assert cfg.rescore_top_k > 0 and not cfg.enable_icp
    pts, nrm, _ = make_room(rng, n_per_plane=1200, noise=0.002,
                            extra_planes=2)
    R, t = random_rigid(rng, max_angle=1.0, max_trans=0.5)
    spts, snrm = transform_cloud(pts, nrm, R.T, -R.T @ t)
    pad = _pad_size(max(pts.shape[0], spts.shape[0]))
    tc = pad_cloud(pts, nrm, pad)
    sc = pad_cloud(spts, snrm, pad)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = ransac.auto_extract(tc.points, tc.normals, tc.count, k1, cfg, pad)
    sp = ransac.auto_extract(sc.points, sc.normals, sc.count, k2, cfg, pad)
    T, info = register_with_planes(pts, nrm, spts, snrm, tp, sp, cfg)
    assert info["success"], info

    # independent recompute of the tight co-visible score of the RETURNED
    # pose (mirrors pipeline.py's rescore block)
    spacing = float(average_spacing(sc.points, sc.mask, cfg.spacing_k,
                                    cfg.spacing_samples))
    dp = cfg.derived(spacing)
    dsd = jnp.float32(dp.down_sample_distance)
    tprep = prepare_cloud(tc, tp, dsd, cfg)
    sprep = prepare_cloud(sc, sp, dsd, cfg)
    Rb = jnp.asarray(T[:3, :3])
    tb = jnp.asarray(T[:3, 3])
    # bit-identical to pipeline.py's r_fine (f32 arithmetic on dsd)
    r_fine = cfg.rescore_radius_factor * dsd / cfg.downsample_factor
    cnt = overlap_mod.exact_overlap_counts(
        Rb[None], tb[None], sprep.ds.points, sprep.ds.mask,
        tprep.ds.points, r_fine * r_fine,
        src_normals=sprep.ds.normals, tgt_normals=tprep.ds.normals,
        normal_cos=cfg.overlap_normal_cos)
    bm, org, cell = overlap_mod.build_occupancy(
        tprep.ds.points, tprep.ds.mask,
        jnp.float32(dp.length_threshold), cfg.overlap_grid)
    covis = overlap_mod.approx_overlap_counts(
        bm, org, cell, Rb[None], tb[None], sprep.ds.points, sprep.ds.mask,
        cfg.overlap_grid)
    denom = float(max(min(int(sprep.ds.count), int(tprep.ds.count)), 1))
    denom_k = max(float(covis[0]), cfg.rescore_covis_floor * denom)
    ov_f = float(cnt[0]) / denom_k
    pf = info["matched_planes"] / max(int(sp.count), 1)
    score_f = cfg.face_matches_weight * pf \
        + (1.0 - cfg.face_matches_weight) * ov_f
    assert np.isclose(info["overlap"], ov_f, rtol=1e-4, atol=1e-5), \
        (info["overlap"], ov_f)
    assert np.isclose(info["score"], score_f, rtol=1e-4, atol=1e-5), \
        (info["score"], score_f)


def test_batch_outcome_truncation_flags(rng):
    """register_array_pairs surfaces per-pair truncation diagnostics
    (cloud_capped / match_saturated / pen_overflow) in PairOutcome,
    mirroring register_clouds' info dict (VERDICT r4 weak-#6)."""
    import dataclasses
    from plade_tpu.dist.mesh import make_mesh, register_array_pairs
    pts, nrm, _ = make_room(rng, n_per_plane=1200, noise=0.002,
                            extra_planes=2)
    R, t = random_rigid(rng, max_angle=1.0, max_trans=0.5)
    spts, snrm = transform_cloud(pts, nrm, R.T, -R.T @ t)
    assert pts.shape[0] > 4096
    cfg = dataclasses.replace(SMALL_CFG, max_points=4096,
                              spacing_samples=1000)
    mesh = make_mesh(1)
    outcomes = register_array_pairs(
        [(pts, nrm, spts, snrm)], cfg, seed=0, mesh=mesh)
    assert len(outcomes) == 1
    o = outcomes[0]
    assert o.cloud_capped is True
    assert isinstance(o.match_saturated, int) and o.match_saturated >= 0
    assert isinstance(o.pen_overflow, int) and o.pen_overflow >= 0


def test_register_with_planes_overload(rng):
    """Core overload parity (plade.cpp:31-580): caller supplies planes."""
    import jax
    from plade_tpu.core.types import pad_cloud
    from plade_tpu.extract import ransac
    from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud
    from plade_tpu.pipeline import register_with_planes, _pad_size
    pts, nrm, _ = make_room(rng, n_per_plane=1200, noise=0.002,
                            extra_planes=2)
    R, t = random_rigid(rng, max_angle=1.0, max_trans=0.5)
    spts, snrm = transform_cloud(pts, nrm, R.T, -R.T @ t)
    pad = _pad_size(max(pts.shape[0], spts.shape[0]))
    tc = pad_cloud(pts, nrm, pad)
    sc = pad_cloud(spts, snrm, pad)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = ransac.auto_extract(tc.points, tc.normals, tc.count, k1,
                             SMALL_CFG, pad)
    sp = ransac.auto_extract(sc.points, sc.normals, sc.count, k2,
                             SMALL_CFG, pad)
    T, info = register_with_planes(pts, nrm, spts, snrm, tp, sp, SMALL_CFG)
    assert info["success"], info
    c = (np.trace(R.T @ T[:3, :3]) - 1) / 2
    assert np.degrees(np.arccos(np.clip(c, -1, 1))) < 3.0
