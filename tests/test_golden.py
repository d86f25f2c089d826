"""Golden test vs the reference's bundled sample pair + ground truth.

The polyhedron pair is the reference's de-facto acceptance artifact
(sample_data/polyhedron_source_groundtruth.txt; SURVEY section 4).  The full
default-size pipeline takes minutes to compile, so this runs only when
PLADE_RUN_GOLDEN=1 (the bench path exercises it on TPU every round).
"""
import os

import numpy as np
import pytest

SAMPLE_DIR = "/root/reference/sample_data"
GT = np.array([
    [-0.50608, 0.86067, 0.05595, -0.25258],
    [0.82135, 0.50072, -0.27326, 0.86333],
    [-0.26320, -0.09234, -0.96031, 0.15475],
    [0.0, 0.0, 0.0, 1.0]])

pytestmark = pytest.mark.skipif(
    os.environ.get("PLADE_RUN_GOLDEN") != "1"
    or not os.path.isdir(SAMPLE_DIR),
    reason="golden run is slow; set PLADE_RUN_GOLDEN=1")


def test_polyhedron_pair_matches_groundtruth():
    from plade_tpu.core.config import PladeConfig
    from plade_tpu.pipeline import register_files

    T, info = register_files(
        os.path.join(SAMPLE_DIR, "polyhedron_target.ply"),
        os.path.join(SAMPLE_DIR, "polyhedron_source.ply"),
        PladeConfig(), seed=0)
    assert info["success"], info
    c = (np.trace(GT[:3, :3].T @ T[:3, :3]) - 1.0) / 2.0
    rot_err = np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))
    trans_err = np.linalg.norm(T[:3, 3] - GT[:3, 3])
    # coarse (no ICP) acceptance: the reference's own room-pair run differs
    # from GT at ~1e-2 (BASELINE.md); polyhedron is cleaner
    assert rot_err < 1.0, (T, rot_err)
    assert trans_err < 0.05, (T, trans_err)


def test_small_overlap_fullscale_scan_pair():
    """Full-scale partial-overlap golden (VERDICT r2 next #1): two ~90k-pt
    scans sharing <= 40% of their points, default config.  The step/radius
    choice is validated in-test by measuring the actual shared fraction in
    the world frame."""
    from plade_tpu.core.config import PladeConfig
    from plade_tpu.io.synthetic import make_scan_sequence
    from plade_tpu.pipeline import register_clouds

    # step/radius calibrated so the measured shared fraction below is
    # ~0.31 (the 3.4 step used before round 4 produced 0.52 — NOT a
    # small-overlap scene; this test had never actually run on TPU)
    rng = np.random.default_rng(21)
    radius, step = 3.2, 4.0
    scans, poses = make_scan_sequence(
        rng, n_scans=2, n_points=94000, overlap_radius=radius, step=step,
        n_rooms=4, n_per_plane=22000, noise=0.015, size=4.0, extra_planes=4,
        normal_noise_deg=4.0, max_angle=1.2, max_trans=0.8)
    (tp, tn), (sp, sn) = scans
    assert min(tp.shape[0], sp.shape[0]) >= 90000
    G = np.linalg.inv(poses[0]) @ poses[1]

    # measured shared fraction: target-scan points (world frame) that the
    # source scan also sees (within its overlap sphere)
    tw = (poses[0][:3, :3] @ tp.T).T + poses[0][:3, 3]
    c1 = np.array([step, 0.0, 0.0])
    shared = np.mean(np.linalg.norm(tw - c1, axis=1) <= radius)
    assert shared <= 0.40, f"scene not small-overlap: {shared:.2f}"

    T, info = register_clouds(tp, tn, sp, sn, PladeConfig(), seed=0)
    assert info["success"], info
    c = (np.trace(G[:3, :3].T @ T[:3, :3]) - 1.0) / 2.0
    rot_err = np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))
    trans_err = np.linalg.norm(T[:3, 3] - G[:3, 3])
    assert rot_err < 2.0, (T, rot_err)
    assert trans_err < 0.15, (T, trans_err)


def test_noisy_fullscale_scan_pair():
    """Full-scale noisy golden standing in for the missing room pair
    (VERDICT missing #4): ~94k-point synthetic building scans with
    realistic scan noise (0.5% of extent), ~6 deg per-point normal error,
    and partial occlusion (the two scans see overlapping but different
    world regions), run at the DEFAULT config.  Thresholds mirror the
    room-pair tolerances (reference run differs from room GT at ~1e-2,
    sample_data/room_source_groundtruth.txt vs file_pairs_results.txt).
    """
    from plade_tpu.core.config import PladeConfig
    from plade_tpu.io.synthetic import make_scan_sequence
    from plade_tpu.pipeline import register_clouds

    rng = np.random.default_rng(12)
    scans, poses = make_scan_sequence(
        rng, n_scans=2, n_points=94000, overlap_radius=3.6, step=2.2,
        n_rooms=3, n_per_plane=22000, noise=0.02, size=4.0, extra_planes=3,
        normal_noise_deg=6.0, max_angle=1.2, max_trans=0.8)
    (tp, tn), (sp, sn) = scans
    assert min(tp.shape[0], sp.shape[0]) >= 90000  # full-scale like room
    G = np.linalg.inv(poses[0]) @ poses[1]  # source scan -> target scan

    T, info = register_clouds(tp, tn, sp, sn, PladeConfig(), seed=0)
    assert info["success"], info
    c = (np.trace(G[:3, :3].T @ T[:3, :3]) - 1.0) / 2.0
    rot_err = np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))
    trans_err = np.linalg.norm(T[:3, 3] - G[:3, 3])
    assert rot_err < 2.0, (T, rot_err)
    assert trans_err < 0.15, (T, trans_err)
