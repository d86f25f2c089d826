"""Unit tests for geometry primitives against analytic cases / brute force."""
import numpy as np
import jax.numpy as jnp

from plade_tpu.geometry import lines, obb, transforms, voxel
from plade_tpu.knn import bruteforce


def rand_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_intersect_planes_analytic():
    # x=1 plane: n=(1,0,0), d=-1 ; y=2 plane: n=(0,1,0), d=-2
    c1 = jnp.array([1.0, 0.0, 0.0, -1.0])
    c2 = jnp.array([0.0, 1.0, 0.0, -2.0])
    direction, point, valid = lines.intersect_planes(c1, c2)
    assert bool(valid)
    np.testing.assert_allclose(np.abs(np.asarray(direction)), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(point)[:2], [1.0, 2.0], atol=1e-5)


def test_intersect_planes_parallel_invalid():
    c1 = jnp.array([0.0, 0.0, 1.0, 0.0])
    c2 = jnp.array([0.0, 0.0, 1.0, -3.0])
    _, _, valid = lines.intersect_planes(c1, c2)
    assert not bool(valid)


def test_closest_points_two_lines(rng):
    for _ in range(8):
        u1 = rng.normal(size=3)
        u2 = rng.normal(size=3)
        p1 = rng.normal(size=3)
        p2 = rng.normal(size=3)
        q1, q2, d = lines.closest_points_two_lines(
            jnp.asarray(u1, jnp.float32), jnp.asarray(p1, jnp.float32),
            jnp.asarray(u2, jnp.float32), jnp.asarray(p2, jnp.float32))
        # brute-force over parameters
        ts = np.linspace(-20, 20, 801, dtype=np.float32)
        a = p1[None] + ts[:, None] * (u1 / np.linalg.norm(u1))[None]
        b = p2[None] + ts[:, None] * (u2 / np.linalg.norm(u2))[None]
        d2 = (np.sum(a * a, 1)[:, None] - 2 * (a @ b.T)
              + np.sum(b * b, 1)[None, :])
        brute = np.sqrt(max(float(d2.min()), 0.0))
        assert abs(float(d) - brute) < 5e-2
        # witness points realize the distance
        np.testing.assert_allclose(
            float(jnp.linalg.norm(q1 - q2)), float(d), rtol=1e-4, atol=1e-5)


def test_rotation_from_two_vecs_exact(rng):
    R = rand_rotation(rng).astype(np.float32)
    v1 = np.array([1.0, 0.2, -0.3], np.float32)
    v2 = np.array([-0.1, 1.0, 0.5], np.float32)
    v1 /= np.linalg.norm(v1)
    v2 /= np.linalg.norm(v2)
    est = transforms.rotation_from_two_vecs(
        jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(R @ v1), jnp.asarray(R @ v2))
    np.testing.assert_allclose(np.asarray(est), R, atol=1e-5)


def test_kabsch_recovers_rigid(rng):
    R = rand_rotation(rng).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    src = rng.normal(size=(50, 3)).astype(np.float32)
    dst = src @ R.T + t
    Re, te = transforms.kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(Re), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), t, atol=1e-4)


def test_obb_axis_aligned_box(rng):
    pts = rng.uniform(low=[0, 0, 0], high=[4, 2, 1], size=(5000, 3)).astype(np.float32)
    mask = np.ones(5000, bool)
    box = obb.compute_obb(jnp.asarray(pts), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(box.center), [2, 1, 0.5], atol=0.1)
    ext = np.sort(np.asarray(box.extents))
    np.testing.assert_allclose(ext, [1, 2, 4], atol=0.12)
    assert abs(float(box.radius) - 2.0) < 0.1
    # corners reconstruct the extremes
    corners = np.asarray(box.corners)
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.min(0), [0, 0, 0], atol=0.2)
    np.testing.assert_allclose(corners.max(0), [4, 2, 1], atol=0.2)


def test_voxel_downsample_grid():
    # 4 points in 2 cells -> 2 centroids
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2],
                    [5.1, 0.1, 0.1], [5.3, 0.1, 0.1],
                    [1e8, 1e8, 1e8]], np.float32)
    mask = np.array([1, 1, 1, 1, 0], bool)
    out = voxel.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 1.0, 8)
    assert int(out.count) == 2
    got = np.asarray(out.points[:2])
    got = got[np.argsort(got[:, 0])]
    np.testing.assert_allclose(got[0], [0.15, 0.15, 0.15], atol=1e-5)
    np.testing.assert_allclose(got[1], [5.2, 0.1, 0.1], atol=1e-5)


def test_voxel_downsample_against_reference_semantics(rng):
    pts = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    leaf = 0.25
    out = voxel.voxel_downsample(jnp.asarray(pts), jnp.ones(2000, bool), leaf, 1024)
    # numpy reference: centroid per occupied cell
    ijk = np.floor((pts - pts.min(0)) / leaf).astype(int)
    keys = {}
    for p, c in zip(pts, map(tuple, ijk)):
        keys.setdefault(c, []).append(p)
    expected = np.array([np.mean(v, axis=0) for v in keys.values()])
    assert int(out.count) == len(keys)
    got = np.asarray(out.points[: len(keys)])
    got = got[np.lexsort(got.T[::-1])]
    expected = expected[np.lexsort(expected.T[::-1])]
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_topk_and_average_spacing(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    d = bruteforce.topk_dist_sq(jnp.asarray(pts[:10]), jnp.asarray(pts), 4)
    full = np.sum((pts[:10, None] - pts[None]) ** 2, axis=-1)
    expected = np.sort(full, axis=1)[:, :4]
    np.testing.assert_allclose(np.asarray(d), expected, rtol=1e-4, atol=1e-5)

    sp = bruteforce.average_spacing(jnp.asarray(pts), jnp.ones(500, bool),
                                    k=6, samples=100)
    # reference semantics: mean over samples of sum(5 NN dists)/6
    nn = np.sort(full, axis=1)  # only first 10 queries checked numerically
    assert 0.05 < float(sp) < 2.0


def test_count_within():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0.05, 0, 0]], np.float32)
    c = bruteforce.count_within(jnp.asarray(pts[:1]), jnp.asarray(pts), 0.1)
    assert int(c[0]) == 2


def test_project_points_to_plane():
    coeffs = jnp.array([0.0, 0.0, 1.0, -2.0])  # z = 2
    p = jnp.array([[1.0, 1.0, 5.0]])
    out = lines.project_points_to_plane(p, coeffs)
    np.testing.assert_allclose(np.asarray(out), [[1, 1, 2]], atol=1e-6)


def test_point_segment_distance():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    p = jnp.array([[0.5, 1.0, 0.0], [2.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    d = lines.point_segment_distance(p, a, b)
    np.testing.assert_allclose(np.asarray(d), [1.0, 1.0, 1.0], atol=1e-6)


def test_pair_descriptors_rigid_invariant(rng):
    """The 8-D pair-line descriptor must be invariant under a rigid motion
    of the whole scene (it is built from distances and angle cosines —
    ComputeDescriptorVectorForPairLines, util.cpp:533-602)."""
    import math
    from plade_tpu.core.types import LineSet
    from plade_tpu.descriptors.pairlines import pair_descriptors

    L = 6
    normals = rng.normal(size=(8, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    support = rng.integers(0, 8, size=(L, 2)).astype(np.int32)
    # line directions consistent with supports: u = n1 x n2
    u = np.cross(normals[support[:, 0]], normals[support[:, 1]])
    u /= np.maximum(np.linalg.norm(u, axis=1, keepdims=True), 1e-9)
    p = rng.normal(size=(L, 3)).astype(np.float32)

    def build(u, p, normals):
        lines = LineSet(direction=jnp.asarray(u, jnp.float32),
                        point=jnp.asarray(p, jnp.float32),
                        support=jnp.asarray(support),
                        count=jnp.asarray(L, jnp.int32))
        return pair_descriptors(lines, jnp.asarray(normals, jnp.float32),
                                jnp.float32(0.5), 32, ordered=False,
                                min_angle_cos=math.cos(math.radians(10)))
    d0 = build(u, p, normals)
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3)
    d1 = build(u @ Q.T, p @ Q.T + t, normals @ Q.T)
    n = int(d0.count)
    np.testing.assert_allclose(np.asarray(d0.desc)[:n],
                               np.asarray(d1.desc)[:n], atol=2e-4)
