"""Scene-mode CLI: multi-scan pairwise registration + pose-graph sync."""
import os

import numpy as np
import pytest

from plade_tpu.cli.main import main
from plade_tpu.io.ply import write_ply
from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud

from test_pipeline import SMALL_CFG


@pytest.fixture(scope="module")
def scan_dir(tmp_path_factory):
    """Three scans of one room scene with known world poses; scan k is the
    room observed from pose T_k (p_scan = T_k^{-1} p_world)."""
    d = tmp_path_factory.mktemp("resso_scene")
    rng = np.random.default_rng(3)
    pts, nrm, _ = make_room(rng, n_per_plane=1200, noise=0.002,
                            extra_planes=3)
    poses = [np.eye(4)]
    for _ in range(2):
        R, t = random_rigid(rng, max_angle=0.8, max_trans=0.5)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T)
    for k, T in enumerate(poses):
        Rinv = T[:3, :3].T
        tinv = -Rinv @ T[:3, 3]
        spts, snrm = transform_cloud(pts, nrm, Rinv, tinv)
        write_ply(str(d / f"scan_{k}.ply"), spts, snrm)
    gt = d / "groundtruth.txt"
    with open(gt, "w") as f:
        for k, T in enumerate(poses):
            f.write(f"scan_{k}\n")
            f.write("\n".join(" ".join(f"{v:.8g}" for v in row)
                              for row in T) + "\n")
    return str(d), poses


def test_scene_mode(scan_dir, monkeypatch, capsys, tmp_path):
    d, poses = scan_dir
    import plade_tpu.core.config as cfgmod
    monkeypatch.setattr(cfgmod, "PladeConfig", lambda **kw: SMALL_CFG)
    out = str(tmp_path / "poses.txt")
    rc = main(["scene", d, out])
    assert rc == 0
    text = open(out).read().splitlines()
    # 3 scans: name line + 4 matrix rows each
    assert len(text) == 3 * 5
    got = []
    for k in range(3):
        rows = [text[k * 5 + 1 + r].split() for r in range(4)]
        got.append(np.asarray(rows, np.float64))
    # recovered poses are world-from-scan in scan-0's frame; ground truth
    # rebased the same way
    base = np.linalg.inv(poses[0])
    for k in range(3):
        gt_k = base @ poses[k]
        c = (np.trace(gt_k[:3, :3].T @ got[k][:3, :3]) - 1) / 2
        rot_err = np.degrees(np.arccos(np.clip(c, -1, 1)))
        assert rot_err < 3.0, (k, rot_err)
        assert np.linalg.norm(got[k][:3, 3] - gt_k[:3, 3]) < 0.2, k
    err = capsys.readouterr().out
    assert "vs ground truth" in err
