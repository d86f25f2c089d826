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
    the scene (paper title: registration with SMALL overlap)."""
    from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud
    from plade_tpu.pipeline import register_clouds
    pts, nrm, _ = make_room(rng, n_per_plane=2000, noise=0.002,
                            extra_planes=3)
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
