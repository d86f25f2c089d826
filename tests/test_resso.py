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


def test_eval_summary_metrics():
    s = EvalSummary(rot_thresh_deg=5.0, trans_thresh=0.5)
    s.results = [
        PairResult("a", "b", np.eye(4), True, rot_err_deg=1.0, trans_err=0.1),
        PairResult("b", "c", np.eye(4), True, rot_err_deg=30.0, trans_err=2.0),
    ]
    assert s.recall == 0.5
    assert abs(s.rmse_trans - np.sqrt((0.1 ** 2 + 2.0 ** 2) / 2)) < 1e-12
    assert rotation_error_deg(np.eye(3), np.eye(3)) == 0.0
