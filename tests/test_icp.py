"""Point-to-plane ICP refinement tests (new vs reference; SURVEY negative
finding #1 — the reference ships the raw coarse hypothesis)."""
import numpy as np
import jax
import jax.numpy as jnp

from plade_tpu.core.types import pad_cloud
from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud
from plade_tpu.refine.icp import refine_icp


def rotation_error_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))


def test_icp_recovers_small_perturbation():
    rng = np.random.default_rng(0)
    pts, nrm, _ = make_room(rng, n_per_plane=800, noise=0.001, extra_planes=2)
    R_gt, t_gt = random_rigid(rng, max_angle=2.0, max_trans=1.0)
    src_pts, _ = transform_cloud(pts, nrm, R_gt.T, -R_gt.T @ t_gt)

    tgt = pad_cloud(pts, nrm, 8192)
    src = pad_cloud(src_pts, None, 8192)

    # perturb the ground truth by ~2 deg / 2 cm — a coarse-stage result
    axis = rng.normal(size=3); axis /= np.linalg.norm(axis)
    a = 0.035
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    dR = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)
    R0 = jnp.asarray((dR @ R_gt).astype(np.float32))
    t0 = jnp.asarray((t_gt + np.array([0.02, -0.015, 0.01])).astype(np.float32))

    R, t, rmse, inl = jax.jit(refine_icp, static_argnames=("iters",))(
        R0, t0, src.points, src.mask, tgt.points, tgt.normals,
        max_corr=0.1, iters=25)
    R = np.asarray(R); t = np.asarray(t)
    assert rotation_error_deg(R, R_gt) < 0.2, rotation_error_deg(R, R_gt)
    assert np.linalg.norm(t - t_gt) < 0.01, np.linalg.norm(t - t_gt)
    assert float(rmse) < 0.005
    # and it improved on the init
    assert rotation_error_deg(R, R_gt) < rotation_error_deg(np.asarray(R0), R_gt)


def test_voxel_downsample_carries_normals():
    from plade_tpu.geometry.voxel import voxel_downsample
    rng = np.random.default_rng(1)
    pts = rng.uniform(size=(500, 3)).astype(np.float32)
    nrm = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (500, 1))
    c = pad_cloud(pts, nrm, 512)
    ds = voxel_downsample(c.points, c.mask, 0.2, 256, normals=c.normals)
    m = np.asarray(ds.mask)
    n = np.asarray(ds.normals)[m]
    np.testing.assert_allclose(n, np.tile([[0, 0, 1]], (m.sum(), 1)), atol=1e-6)
