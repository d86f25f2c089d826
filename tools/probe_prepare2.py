"""Attribute prepare_cloud's fused cost: cumulative-stage jit bisection.

Each program adds one more stage INSIDE one jit; the delta between
consecutive rows is that stage's true incremental cost (no per-stage
dispatch noise).  Every program returns a scalar contraction of its live
outputs so XLA cannot dead-code-eliminate a stage.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from plade_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from plade_tpu.core.config import PladeConfig
from plade_tpu.core.types import pad_cloud
from plade_tpu.io.ply import read_ply
from plade_tpu.extract import ransac
from plade_tpu.geometry.obb import compute_obb
from plade_tpu.geometry.voxel import voxel_downsample, voxel_downsample_by_plane
from plade_tpu.geometry.lines import intersect_planes, project_points_to_plane
from plade_tpu.pipeline import _pad_size

SAMPLE = "/root/reference/sample_data"


def timed(label, fn, n=3):
    f = jax.jit(fn)
    float(f(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(n):
        float(f(jnp.float32((i + 1) * 1e-9)))
    print(f"{label:<34s} {(time.perf_counter() - t0) / n * 1e3:9.1f} ms",
          flush=True)


def main():
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    pad = _pad_size(tp.shape[0])
    cloud = pad_cloud(tp, tn, pad)
    extractor = ransac._cached_extractor(cfg, pad)
    planes0, _ = extractor(cloud.points, cloud.normals, cloud.count,
                           jax.random.PRNGKey(0),
                           cfg.ransac_min_allowed_support)
    planes = ransac.select_planes(planes0, cfg)
    from plade_tpu.knn.bruteforce import average_spacing_jit
    sp = float(average_spacing_jit(cloud.points, cloud.mask,
                                   cfg.spacing_k, cfg.spacing_samples))
    dsd0 = cfg.downsample_factor * sp
    P = planes.coeffs.shape[0]

    def s_sum(*xs):
        return sum(jnp.sum(x) for x in xs)

    def p1(eps):
        ds = voxel_downsample(cloud.points, cloud.mask, dsd0 + eps,
                              cfg.max_ds_points, normals=cloud.normals)
        return s_sum(ds.points, ds.count)

    def p2(eps):
        ds = voxel_downsample(cloud.points, cloud.mask, dsd0 + eps,
                              cfg.max_ds_points, normals=cloud.normals)
        box = compute_obb(ds.points, ds.mask)
        return s_sum(ds.points, box.center, box.extents, box.corners)

    def p3(eps):
        r = p2(eps)
        pts, counts = voxel_downsample_by_plane(
            cloud.points, cloud.mask, planes.point_plane, dsd0 + eps, P,
            cfg.max_plane_points)
        return r + s_sum(pts, counts)

    def p4(eps):
        r = p2(eps)
        pts, counts = voxel_downsample_by_plane(
            cloud.points, cloud.mask, planes.point_plane, dsd0 + eps, P,
            cfg.max_plane_points)
        pmasks = jnp.arange(cfg.max_plane_points)[None, :] < counts[:, None]
        pboxes = compute_obb(pts, pmasks)
        return r + s_sum(pts, pboxes.corners)

    def p5(eps):
        r = p4(eps)
        ii, jj = jnp.meshgrid(jnp.arange(P), jnp.arange(P), indexing="ij")
        d_, pt_, v_ = intersect_planes(planes.coeffs[ii], planes.coeffs[jj],
                                       cfg.plane_pair_max_cos)
        return r + s_sum(d_, pt_, v_.astype(jnp.float32))

    def p6(eps):
        from plade_tpu.pipeline import _prepare_cloud_impl
        prep = _prepare_cloud_impl(cloud, planes, dsd0 + eps, cfg)
        return s_sum(prep.ds.points, prep.geom.corners, prep.lines.point,
                     prep.lines.direction,
                     prep.bounding_radius, prep.geom.ds_points)

    timed("1 voxel_downsample", p1)
    timed("2 + cloud obb", p2)
    timed("3 + voxel_by_plane", p3)
    timed("4 + plane obbs", p4)
    timed("5 + intersect lines", p5)
    timed("6 full _prepare_cloud_impl", p6)


if __name__ == "__main__":
    main()
