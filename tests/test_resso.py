"""RESSO loader + evaluation harness tests on a synthetic scene directory."""
import numpy as np

from plade_tpu.io.resso import (EvalSummary, PairResult, _read_matrices,
                                consecutive_pairs, load_scene,
                                rotation_error_deg)


def _write_scene(d, n_scans=3):
    from plade_tpu.io.ply import write_ply
    from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud
    rng = np.random.default_rng(0)
    pts, nrm, _ = make_room(rng, n_per_plane=200, noise=0.002, extra_planes=2)
    poses = []
    for k in range(n_scans):
        R, t = random_rigid(rng, max_angle=1.0, max_trans=0.5)
        # scan k = scene points seen in frame k: x_scan = R^T (x_scene - t)
        spts, snrm = transform_cloud(pts, nrm, R.T, -R.T @ t)
        write_ply(str(d / f"scan_{k}.ply"), spts, snrm)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T)
    with open(d / "groundtruth.txt", "w") as f:
        for k, T in enumerate(poses):
            f.write(f"scan_{k}\n")
            for row in T:
                f.write(" ".join(str(v) for v in row) + "\n")
    return poses


def test_load_scene_and_pair_gt(tmp_path):
    poses = _write_scene(tmp_path)
    scene = load_scene(str(tmp_path))
    assert len(scene.scan_files) == 3
    assert scene.gt_poses is not None and scene.gt_poses.shape == (3, 4, 4)
    G = scene.pair_ground_truth(0, 1)
    expected = np.linalg.inv(poses[0]) @ poses[1]
    np.testing.assert_allclose(G, expected, atol=1e-12)
    assert consecutive_pairs(scene) == [(0, 1), (1, 2)]


def test_read_matrices_tolerates_headers(tmp_path):
    p = tmp_path / "gt.log"
    p.write_text("0 1 0\n" + "\n".join(
        " ".join(str(float(i == j)) for j in range(4)) for i in range(4)) + "\n")
    names, mats = _read_matrices(str(p))
    assert mats.shape == (1, 4, 4)
    np.testing.assert_allclose(mats[0], np.eye(4))


def test_make_scan_sequence_overlap_and_gt(tmp_path):
    """The synthetic RESSO-equivalent generator: consecutive scans share a
    partial (30-70%) region, ground-truth poses map scans back onto the
    world, and write_scene produces a directory load_scene can read."""
    from plade_tpu.io.synthetic import make_scan_sequence, write_scene
    rng = np.random.default_rng(3)
    scans, poses = make_scan_sequence(
        rng, n_scans=4, n_points=4000, overlap_radius=2.6, step=2.0,
        n_rooms=2, n_per_plane=400, noise=0.005, extra_planes=2)
    assert len(scans) == 4 and poses.shape == (4, 4, 4)
    # GT correctness: scan points mapped by the pose must coincide with a
    # subset of the world (here: with the next scan's mapped points)
    world_pts = [s[0] @ T[:3, :3].T + T[:3, 3] for (s, T) in
                 zip(scans, poses)]
    for a, b in zip(world_pts[:-1], world_pts[1:]):
        d = np.linalg.norm(a[:, None, :1] - b[None, :, :1], axis=-1)
        # partial overlap: some a-points near b (shared region), some far
        mn = np.abs(a[:, None, 0] - b[None, :, 0]).min(axis=1)
        frac = float((mn < 1e-3).mean())
        assert 0.2 < frac < 0.8, frac
    d = write_scene(str(tmp_path / "scene"), scans, poses)
    scene = load_scene(d)
    assert len(scene.scan_files) == 4
    assert scene.gt_poses is not None
    np.testing.assert_allclose(scene.gt_poses, poses, atol=1e-8)


def test_evaluate_scene_device_batch(tmp_path):
    """evaluate_scene(device_batch=True) routes pairs through the sharded
    mesh path and scores recall against ground truth (VERDICT weak #7)."""
    import jax

    from plade_tpu.dist import mesh as mesh_mod
    from plade_tpu.io.resso import evaluate_scene
    from plade_tpu.io.synthetic import make_scan_sequence, write_scene
    from test_pipeline import SMALL_CFG

    rng = np.random.default_rng(5)
    scans, poses = make_scan_sequence(
        rng, n_scans=3, n_points=9000, overlap_radius=3.4, step=1.4,
        n_rooms=2, n_per_plane=1200, noise=0.002, extra_planes=3,
        max_angle=0.8, max_trans=0.4)
    d = write_scene(str(tmp_path / "scene"), scans, poses)
    scene = load_scene(d)
    mesh = mesh_mod.make_mesh(2, intra=1, devices=jax.devices("cpu")[:2])
    summary = evaluate_scene(scene, cfg=SMALL_CFG, device_batch=True,
                             mesh=mesh, verbose=False)
    assert len(summary.results) == 2
    assert summary.recall == 1.0, [
        (r.rot_err_deg, r.trans_err) for r in summary.results]


def test_eval_summary_metrics():
    s = EvalSummary(rot_thresh_deg=5.0, trans_thresh=0.5)
    s.results = [
        PairResult("a", "b", np.eye(4), True, rot_err_deg=1.0, trans_err=0.1),
        PairResult("b", "c", np.eye(4), True, rot_err_deg=30.0, trans_err=2.0),
    ]
    assert s.recall == 0.5
    assert abs(s.rmse_trans - np.sqrt((0.1 ** 2 + 2.0 ** 2) / 2)) < 1e-12
    assert rotation_error_deg(np.eye(3), np.eye(3)) == 0.0
