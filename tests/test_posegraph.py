"""Pose-graph synchronization tests (synthetic multi-scan scenes)."""
import numpy as np

from plade_tpu.dist import posegraph


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float32)


def _make_scene(rng, K, edges_ij, rot_noise=0.0, trans_noise=0.0):
    """True world poses + relative edges dst<-src with optional noise."""
    Rs = [np.eye(3, dtype=np.float32)] + [_random_rotation(rng)
                                          for _ in range(K - 1)]
    ts = [np.zeros(3, dtype=np.float32)] + [
        rng.normal(size=3).astype(np.float32) for _ in range(K - 1)]
    edges = []
    for (i, j) in edges_ij:
        # p_i = R_ij p_j + t_ij with R_j = R_i R_ij, t_j = R_i t_ij + t_i
        Rij = Rs[i].T @ Rs[j]
        tij = Rs[i].T @ (ts[j] - ts[i])
        if rot_noise:
            n = _random_rotation(rng)
            a = rot_noise
            Rn = np.eye(3) + a * (n - n.T) / 2  # small skew perturbation
            U, _, Vt = np.linalg.svd(Rn)
            Rij = (U @ Vt @ Rij).astype(np.float32)
        if trans_noise:
            tij = tij + rng.normal(scale=trans_noise, size=3)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rij
        T[:3, 3] = tij
        edges.append((i, j, T, 1.0))
    return Rs, ts, edges


def _pose_errors(Rs, ts, R, t):
    rerr, terr = [], []
    for k in range(len(Rs)):
        c = (np.trace(Rs[k].T @ np.asarray(R[k])) - 1) / 2
        rerr.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
        terr.append(np.linalg.norm(np.asarray(t[k]) - ts[k]))
    return np.array(rerr), np.array(terr)


def test_chain_exact(rng):
    K = 6
    Rs, ts, edges = _make_scene(rng, K, [(i, i + 1) for i in range(K - 1)])
    g = posegraph.from_edges(edges, K)
    R, t = posegraph.synchronize(g, K)
    rerr, terr = _pose_errors(Rs, ts, R, t)
    assert rerr.max() < 0.1, rerr
    assert terr.max() < 1e-3, terr


def test_loop_with_noise(rng):
    K = 8
    edges_ij = [(i, (i + 1) % K) for i in range(K)] + [(0, 4), (2, 6)]
    Rs, ts, edges = _make_scene(rng, K, edges_ij,
                                rot_noise=0.02, trans_noise=0.01)
    g = posegraph.from_edges(edges, K)
    R, t = posegraph.synchronize(g, K)
    rerr, terr = _pose_errors(Rs, ts, R, t)
    assert rerr.max() < 3.0, rerr
    assert terr.max() < 0.1, terr
    ang, tr = posegraph.residuals(g, R, t)
    assert float(np.asarray(ang).max()) < 5.0


def test_padded_edges_ignored(rng):
    K = 4
    Rs, ts, edges = _make_scene(rng, K, [(0, 1), (1, 2), (2, 3)])
    g = posegraph.from_edges(edges, K, max_edges=8)  # 5 zero-weight pads
    R, t = posegraph.synchronize(g, K)
    rerr, terr = _pose_errors(Rs, ts, R, t)
    assert rerr.max() < 0.1
    assert terr.max() < 1e-3
