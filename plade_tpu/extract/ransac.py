"""Batched greedy RANSAC plane extraction.

TPU-native reformulation of the Schnabel Efficient-RANSAC plane detector the
reference wraps (code/3rd_party/ransac/RansacShapeDetector.cpp:456-969;
wrapper code/PLADE/plane_extraction.cpp:61-200).  The reference engine is a
lazy, sequential candidate tournament with octree subset scoring — shaped
for a single CPU core.  On TPU, scoring every candidate against every point
is a small dense matmul, so the design becomes:

  per greedy round (lax.while_loop):
    1. draw S seed points among unassigned points (categorical sampling);
       each seed proposes the plane through the point with its normal
       (replaces the 3-point octree-cell draw; the <=3 least-squares refit
       rounds recover the same plane quality)
    2. score all S candidates exactly against all points on the MXU
       (inlier: dist < eps  and  |n.n_hat| > normal_thresh  and unassigned
        — the compatibility test of ScoreComputer.h:10-43)
    3. pick the argmax candidate, refit <=3 times on its 3*eps band
       (RansacShapeDetector.cpp:633-655; the global score band is 3*eps,
        RansacShapeDetector.cpp:472)
    4. trim to the largest connected component on a 2-D occupancy bitmap in
       plane coordinates with a morphological close, mirroring
       BitmapPrimitiveShape::ConnectedComponent (BitmapPrimitiveShape.cpp:
       97-271): cell size = bitmap_reso * scale, dilate+erode cross, CC by
       iterated 3x3 min-label propagation, keep the component with most
       points
    5. accept if the trimmed support >= min_support; mark points assigned

Deliberate deviation: plane normals are oriented along the mean normal of
their support points.  The reference intended this (correct_normal,
plane_extraction.cpp:43-58) but a bug (count never incremented -> NaN mean)
makes it a no-op, leaving signs arbitrary; consistent orientation makes the
pair-line descriptors sign-stable across clouds and strictly improves
matching recall.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import PladeConfig
from ..core.types import BIG, PlaneSet

_EPS = 1e-12


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)


def _plane_basis(normal):
    """Two orthonormal in-plane axes for a unit normal (3,)."""
    h = jnp.where(jnp.abs(normal[0]) > 0.9,
                  jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    u = _normalize(jnp.cross(normal, h))
    v = jnp.cross(normal, u)
    return u, v


def _fit_plane(points, weights):
    """Weighted LS plane through points: centroid + smallest covariance
    eigenvector (Plane::LeastSquaresFit semantics, Plane.cpp:169-191)."""
    w = weights / jnp.maximum(jnp.sum(weights), 1.0)
    c = jnp.sum(points * w[:, None], axis=0)
    d = (points - c) * jnp.sqrt(w)[:, None]
    cov = d.T @ d
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[:, 0]  # smallest eigenvalue -> plane normal
    return n, c


class _State(NamedTuple):
    key: jnp.ndarray
    assigned: jnp.ndarray      # (N,) bool
    point_plane: jnp.ndarray   # (N,) int32
    coeffs: jnp.ndarray        # (P, 4)
    sizes: jnp.ndarray         # (P,) int32
    num_planes: jnp.ndarray    # () int32
    fail_streak: jnp.ndarray   # () int32 — consecutive rounds w/o a plane
    min_support: jnp.ndarray   # () int32 — current support threshold
    done: jnp.ndarray          # () bool


def _largest_component_mask(uv, inlier, cell, grid: int, cc_iters: int):
    """Keep the inlier points lying in the largest connected component of
    the occupancy bitmap over in-plane coords ``uv`` (N, 2).

    The cell is stretched when the plane's extent exceeds ``grid`` cells —
    the reference sizes its bitmap exactly to extent/cell
    (BitmapPrimitiveShape.cpp:97-130), typically a few dozen cells per
    side, so a small fixed grid loses nothing on ordinary planes and only
    coarsens the trim for extreme aspect ratios."""
    big = jnp.float32(1e30)
    umin = jnp.min(jnp.where(inlier[:, None], uv, big), axis=0)
    umax = jnp.max(jnp.where(inlier[:, None], uv, -big), axis=0)
    extent = jnp.max(umax - umin)
    cell = jnp.maximum(jnp.maximum(cell, _EPS), extent / (grid - 1))
    ij = jnp.floor((uv - umin) / cell).astype(jnp.int32)
    ij = jnp.clip(ij, 0, grid - 1)
    flat = ij[:, 0] * grid + ij[:, 1]
    occ_counts = jnp.zeros((grid * grid,), jnp.int32).at[flat].add(
        inlier.astype(jnp.int32))
    occ = (occ_counts > 0).reshape(grid, grid)

    def close(bitmap):
        # morphological close with the cross structuring element
        # (DilateCross/ErodeCross, BitmapPrimitiveShape.cpp:133-141)
        def cross(b, op, pad_val):
            p = jnp.pad(b, 1, constant_values=pad_val)
            return op(op(op(op(b, p[:-2, 1:-1]), p[2:, 1:-1]),
                         p[1:-1, :-2]), p[1:-1, 2:])
        dil = cross(bitmap, jnp.logical_or, False)
        return cross(dil, jnp.logical_and, True) | bitmap

    closed = close(occ)
    # connected components: 8-neighbor min-label propagation accelerated
    # with pointer jumping (labels <- labels[labels]), which squares the
    # effective propagation distance per iteration — cc_iters=16 saturates
    # the default 64^2 grid with margin vs ~2*grid for pure local stencils
    # (the former 192-step sequential chain dominated extraction)
    idx = jnp.arange(grid * grid, dtype=jnp.int32).reshape(grid, grid)
    inf_label = jnp.int32(grid * grid)
    labels = jnp.where(closed, idx, inf_label)

    def prop(_, lab):
        p = jnp.pad(lab, 1, constant_values=inf_label)
        m = lab
        for di in (0, 1, 2):
            for dj in (0, 1, 2):
                m = jnp.minimum(m, p[di:di + grid, dj:dj + grid])
        m = jnp.where(closed, m, inf_label)
        # pointer jump: follow the current representative one hop
        flat = m.reshape(-1)
        safe = jnp.minimum(flat, grid * grid - 1)
        jumped = jnp.where(flat < inf_label, flat[safe], inf_label)
        return jnp.minimum(m, jumped.reshape(grid, grid))

    labels = jax.lax.fori_loop(0, cc_iters, prop, labels)
    # component size in points: scatter point counts by their cell's label
    point_labels = labels.reshape(-1)[flat]
    comp_counts = jnp.zeros((grid * grid + 1,), jnp.int32).at[point_labels].add(
        inlier.astype(jnp.int32))
    best_label = jnp.argmax(comp_counts[:-1])
    return inlier & (point_labels == best_label)


def build_extract_fn(cfg: PladeConfig, num_points: int,
                     max_extract: int | None = None):
    """Build the (un-jitted) extraction function for a fixed cloud size —
    composable inside larger jitted programs (pipeline.register_pair_device)."""
    max_extract = max_extract or cfg.max_planes
    S = cfg.ransac_candidates_per_round
    grid = cfg.bitmap_grid
    cc_iters = cfg.bitmap_cc_iters

    def round_body(state: _State, points, normals, valid, eps, bitmap_eps,
                   floor_support, min_planes):
        min_support = state.min_support
        key, k1 = jax.random.split(state.key)
        free = valid & ~state.assigned
        # S distinct uniform seeds among free points via the Gumbel top-k
        # trick: one noise vector + one top-k, instead of categorical's S
        # independent 131k-gumbel draws (which dominated the round cost)
        g = jax.random.uniform(k1, (free.shape[0],))
        scores = jnp.where(free, g, -1.0)
        _, seeds = jax.lax.approx_max_k(scores.reshape(1, -1), S)
        seeds = seeds[0]
        cand_n = _normalize(normals[seeds])
        cand_p = points[seeds]
        cand_d = -jnp.sum(cand_n * cand_p, axis=-1)

        # exact scoring of all candidates on all points (MXU; full f32 —
        # eps sits near bf16 noise of O(1) coordinates)
        hi = jax.lax.Precision.HIGHEST
        dist = jnp.abs(jnp.dot(points, cand_n.T, precision=hi)
                       + cand_d[None, :])                           # (N, S)
        ndot = jnp.abs(jnp.dot(normals, cand_n.T, precision=hi))    # (N, S)
        compat = (dist < eps) & (ndot > cfg.ransac_normal_thresh) & free[:, None]
        counts = jnp.sum(compat.astype(jnp.int32), axis=0)          # (S,)
        best = jnp.argmax(counts)
        n, p0 = cand_n[best], cand_p[best]

        # least-squares refit rounds on the 3*eps compatibility band
        def refit(_, nc):
            n_, c_ = nc
            d_ = -jnp.sum(n_ * c_)
            dist_ = jnp.abs(points @ n_ + d_)
            ndot_ = jnp.abs(jnp.sum(normals * n_, axis=-1))
            band = (dist_ < 3.0 * eps) & (ndot_ > cfg.ransac_normal_thresh) & free
            n2, c2 = _fit_plane(points, band.astype(jnp.float32))
            n2 = jnp.where(jnp.sum(n2 * n_) < 0, -n2, n2)
            return (n2, c2)

        n, c = jax.lax.fori_loop(0, cfg.ransac_refit_rounds, refit, (n, p0))
        d = -jnp.sum(n * c)
        dist_f = jnp.abs(points @ n + d)
        ndot_f = jnp.abs(jnp.sum(normals * n, axis=-1))
        inlier = (dist_f < 3.0 * eps) & (ndot_f > cfg.ransac_normal_thresh) & free

        # largest-connected-component trim in plane coordinates
        u, v = _plane_basis(n)
        uv = jnp.stack([points @ u, points @ v], axis=-1)
        kept = _largest_component_mask(uv, inlier, bitmap_eps, grid, cc_iters)
        support = jnp.sum(kept.astype(jnp.int32))
        accept = (support >= min_support) & (state.num_planes < max_extract)

        # orient normal along mean support-point normal (intended
        # correct_normal semantics; see module docstring)
        mean_n = jnp.sum(jnp.where(kept[:, None], normals, 0.0), axis=0)
        flip = jnp.sum(mean_n * n) < 0
        n_o = jnp.where(flip, -n, n)
        d_o = jnp.where(flip, -d, d)

        pid = state.num_planes
        new_assigned = jnp.where(accept, state.assigned | kept, state.assigned)
        new_point_plane = jnp.where(accept & kept, pid, state.point_plane)
        new_coeffs = jnp.where(
            accept,
            state.coeffs.at[pid].set(jnp.concatenate([n_o, d_o[None]])),
            state.coeffs)
        new_sizes = jnp.where(accept, state.sizes.at[pid].set(support),
                              state.sizes)
        fail_streak = jnp.where(accept, 0, state.fail_streak + 1)
        num_planes = jnp.where(accept, pid + 1, pid)

        # auto-tune schedule on device (reference extract(), plade.cpp:
        # 602-635): a streak of failed redraws at the current support level
        # halves it — but only while we still lack min_planes planes;
        # otherwise the level is exhausted and extraction ends.  One pass
        # replaces the reference's up-to-10 full detector re-runs.
        exhausted = fail_streak >= 3
        need_more = num_planes < min_planes
        can_halve = min_support > floor_support
        halve = exhausted & need_more & can_halve
        new_support = jnp.where(
            halve, jnp.maximum(min_support // 2, floor_support), min_support)
        done = (exhausted & ~(need_more & can_halve)) | \
            (num_planes >= max_extract)
        return _State(
            key=key,
            assigned=new_assigned,
            point_plane=new_point_plane,
            coeffs=new_coeffs,
            sizes=new_sizes,
            num_planes=num_planes,
            fail_streak=jnp.where(halve, 0, fail_streak),
            min_support=new_support,
            done=done,
        )

    def extract(points, normals, count, key, floor_support,
                init_support=None, min_planes=None):
        """points/normals: (N, 3) BIG-padded; count: () int32.

        Returns a PlaneSet padded to ``max_extract`` planes, greedy order.
        The support threshold starts at ``init_support`` (default: the
        reference's 10000) and halves down to ``floor_support`` whenever a
        redraw streak fails while fewer than ``min_planes`` planes exist —
        the device-resident form of the reference auto-tuner.
        """
        if init_support is None:
            init_support = cfg.ransac_init_min_support
        if min_planes is None:
            min_planes = cfg.min_planes
        valid = jnp.arange(num_points) < count
        safe_pts = jnp.where(valid[:, None], points, 0.0)
        big = jnp.float32(1e30)
        pmin = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
        pmax = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
        scale = jnp.max(pmax - pmin)  # PointCloud::getScale (PointCloud.h:94)
        eps = cfg.ransac_dist_thresh * scale
        bitmap_eps = cfg.ransac_bitmap_reso * scale

        init = _State(
            key=key,
            assigned=jnp.zeros((num_points,), jnp.bool_),
            point_plane=jnp.full((num_points,), -1, jnp.int32),
            coeffs=jnp.zeros((max_extract, 4), jnp.float32),
            sizes=jnp.zeros((max_extract,), jnp.int32),
            num_planes=jnp.asarray(0, jnp.int32),
            fail_streak=jnp.asarray(0, jnp.int32),
            min_support=jnp.maximum(jnp.asarray(init_support, jnp.int32),
                                    jnp.asarray(floor_support, jnp.int32)),
            done=jnp.asarray(False),
        )

        def cond(s):
            return ~s.done

        def body(s):
            return round_body(s, safe_pts, normals, valid, eps, bitmap_eps,
                              jnp.asarray(floor_support, jnp.int32),
                              jnp.asarray(min_planes, jnp.int32))

        final = jax.lax.while_loop(cond, body, init)
        return PlaneSet(coeffs=final.coeffs, sizes=final.sizes,
                        count=final.num_planes,
                        point_plane=final.point_plane)

    return extract


def make_extractor(cfg: PladeConfig, num_points: int,
                   max_extract: int | None = None):
    """Jitted standalone extraction for fixed cloud size."""
    return jax.jit(build_extract_fn(cfg, num_points, max_extract))


def auto_extract(points, normals, count, key, cfg: PladeConfig,
                 num_points: int):
    """Plane extraction with the reference's auto-tuning semantics
    (plade.cpp:602-635): aim for 10..40 planes; min support starts at
    10000, halves down to 200 until >= 10 planes; >40 planes keeps the
    largest 40.

    TPU reformulation: extract once greedily with the floor support (200)
    and up to 64 planes, then select the support threshold a posteriori —
    one device pass instead of up to 10 detector re-runs.
    """
    extractor = _cached_extractor(cfg, num_points)
    planes = extractor(points, normals, count, key,
                       cfg.ransac_min_allowed_support)
    return select_planes(planes, cfg)


@functools.lru_cache(maxsize=8)
def _cached_extractor(cfg: PladeConfig, num_points: int):
    return make_extractor(cfg, num_points, max_extract=64)


def _support_thresholds(cfg: PladeConfig) -> list[int]:
    """The reference's halving schedule: 10000, 5000, ..., >= floor
    (plade.cpp:607-633)."""
    ts = []
    t = cfg.ransac_init_min_support
    while t >= cfg.ransac_min_allowed_support:
        ts.append(t)
        t //= 2
    return ts


def select_planes_device(planes: PlaneSet, cfg: PladeConfig) -> PlaneSet:
    """Device-side (jittable) variant of :func:`select_planes` — the same
    auto-tune semantics as the reference's extract() loop (plade.cpp:602-635)
    expressed as masked reductions, so the whole pipeline can stay on
    device for batched/sharded execution.
    """
    P0 = planes.coeffs.shape[0]
    P = cfg.max_planes
    sizes = planes.sizes
    valid = jnp.arange(P0) < planes.count
    th = jnp.asarray(_support_thresholds(cfg), jnp.int32)          # (T,)
    cnt = jnp.sum((sizes[None, :] >= th[:, None]) & valid[None, :], axis=1)
    okth = cnt >= cfg.min_planes
    chosen = jnp.where(jnp.any(okth), th[jnp.argmax(okth)],
                       jnp.int32(cfg.ransac_min_allowed_support))
    keep = valid & (sizes >= chosen)
    # largest max_planes by support, then restored to greedy order
    order = jnp.argsort(-jnp.where(keep, sizes, -1))
    kept = order[:P]
    kept_valid = keep[kept]
    kk = jnp.sort(jnp.where(kept_valid, kept, P0))
    new_valid = kk < P0
    kk_safe = jnp.minimum(kk, P0 - 1)
    coeffs = jnp.where(new_valid[:, None], planes.coeffs[kk_safe], 0.0)
    out_sizes = jnp.where(new_valid, sizes[kk_safe], 0)
    remap = jnp.full((P0 + 1,), -1, jnp.int32).at[
        jnp.where(new_valid, kk_safe, P0)].set(
        jnp.arange(P, dtype=jnp.int32), mode="drop")
    pp = planes.point_plane
    new_pp = jnp.where(pp >= 0, remap[jnp.clip(pp, 0, P0)], -1)
    return PlaneSet(coeffs=coeffs, sizes=out_sizes,
                    count=jnp.sum(new_valid.astype(jnp.int32)),
                    point_plane=new_pp.astype(jnp.int32))


def select_planes_pinned(planes: PlaneSet, cfg: PladeConfig) -> PlaneSet:
    """Selection for the explicit min-support overload (plade.cpp:583-599).

    The reference pins the RANSAC support threshold and applies **no**
    auto-tune halving or post-selection — every extracted plane is used.
    Extraction already enforced support >= the pinned value (it ran with
    floor == init == the pinned support), so this only trims to the
    ``max_planes`` buffer (largest by support, greedy order restored) and
    remaps point-plane ids.
    """
    import numpy as np
    sizes = np.asarray(planes.sizes)
    n = int(planes.count)
    keep = np.arange(n)
    if n > cfg.max_planes:
        order = np.argsort(-sizes[:n], kind="stable")
        keep = np.sort(order[: cfg.max_planes])
    P = cfg.max_planes
    coeffs = np.zeros((P, 4), np.float32)
    out_sizes = np.zeros((P,), np.int32)
    remap = np.full((max(n, 1) + 1,), -1, np.int32)
    for new_id, old_id in enumerate(keep):
        coeffs[new_id] = np.asarray(planes.coeffs)[old_id]
        out_sizes[new_id] = sizes[old_id]
        remap[old_id] = new_id
    point_plane = np.asarray(planes.point_plane)
    new_point_plane = np.where(point_plane >= 0, remap[point_plane], -1)
    return PlaneSet(coeffs=jnp.asarray(coeffs),
                    sizes=jnp.asarray(out_sizes),
                    count=jnp.asarray(len(keep), jnp.int32),
                    point_plane=jnp.asarray(new_point_plane.astype(np.int32)))


def select_planes(planes: PlaneSet, cfg: PladeConfig) -> PlaneSet:
    """Post-selection implementing the auto-tune support thresholds.

    Planes arrive in greedy (size-biased) order with support >= the floor.
    Choose the largest min-support threshold from the reference's halving
    schedule (10000, 5000, ..., >=200) that leaves >= min_planes planes;
    keep at most max_planes (the reference keeps the largest 40,
    plade.cpp:611-620).
    """
    import numpy as np
    sizes = np.asarray(planes.sizes)
    n = int(planes.count)
    sizes = sizes[:n]
    thresholds = []
    t = cfg.ransac_init_min_support
    while t >= cfg.ransac_min_allowed_support:
        thresholds.append(t)
        t //= 2
    chosen = cfg.ransac_min_allowed_support
    for t in thresholds:
        if int((sizes >= t).sum()) >= cfg.min_planes:
            chosen = t
            break
    keep = np.where(sizes >= chosen)[0]
    # keep the largest max_planes by support
    if len(keep) > cfg.max_planes:
        order = np.argsort(-sizes[keep], kind="stable")
        keep = np.sort(keep[order[: cfg.max_planes]])
    P = cfg.max_planes
    coeffs = np.zeros((P, 4), np.float32)
    out_sizes = np.zeros((P,), np.int32)
    remap = np.full((n + 1,), -1, np.int32)
    for new_id, old_id in enumerate(keep):
        coeffs[new_id] = np.asarray(planes.coeffs)[old_id]
        out_sizes[new_id] = sizes[old_id]
        remap[old_id] = new_id
    point_plane = np.asarray(planes.point_plane)
    new_point_plane = np.where(point_plane >= 0, remap[point_plane], -1)
    return PlaneSet(coeffs=jnp.asarray(coeffs),
                    sizes=jnp.asarray(out_sizes),
                    count=jnp.asarray(len(keep), jnp.int32),
                    point_plane=jnp.asarray(new_point_plane.astype(np.int32)))
