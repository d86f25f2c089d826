"""Split prepare_cloud's cost into sub-stages on the sample pair (TPU)."""
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
from plade_tpu.knn.bruteforce import average_spacing_jit
from plade_tpu.pipeline import prepare_cloud, _pad_size

SAMPLE = "/root/reference/sample_data"


def _sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf).ravel()[:1]
    return out


def timed(label, fn, *a, n=3):
    out = _sync(fn(*a, jnp.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(n):
        out = _sync(fn(*a, jnp.float32((i + 1) * 1e-9)))
    print(f"{label:<28s} {(time.perf_counter() - t0) / n * 1e3:9.1f} ms",
          flush=True)
    return out


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
    sp = float(average_spacing_jit(cloud.points, cloud.mask,
                                   cfg.spacing_k, cfg.spacing_samples))
    dsd = jnp.float32(cfg.downsample_factor * sp)

    timed("full prepare_cloud",
          lambda eps: prepare_cloud(cloud, planes, dsd + eps, cfg))

    f_vd = jax.jit(lambda eps: voxel_downsample(
        cloud.points, cloud.mask, dsd + eps, cfg.max_ds_points,
        normals=cloud.normals))
    ds = timed("voxel_downsample", f_vd)

    f_obb = jax.jit(lambda eps: compute_obb(ds.points + eps, ds.mask))
    timed("obb (cloud)", f_obb)

    P = planes.coeffs.shape[0]
    f_vp = jax.jit(lambda eps: voxel_downsample_by_plane(
        cloud.points, cloud.mask, planes.point_plane, dsd + eps, P,
        cfg.max_plane_points))
    pts, counts = timed("voxel_by_plane", f_vp)

    pmasks = jnp.arange(cfg.max_plane_points)[None, :] < counts[:, None]

    f_pobb = jax.jit(lambda eps: compute_obb(pts + eps, pmasks))
    timed("obb (40 planes)", f_pobb)

    pboxes = compute_obb(pts, pmasks)

    f_proj = jax.jit(lambda eps: jax.vmap(project_points_to_plane)(
        pboxes.corners[:, :4] + eps, planes.coeffs))
    timed("project corners", f_proj)

    ii, jj = jnp.meshgrid(jnp.arange(P), jnp.arange(P), indexing="ij")
    f_lines = jax.jit(lambda eps: intersect_planes(
        planes.coeffs[ii] + eps, planes.coeffs[jj], cfg.plane_pair_max_cos))
    timed("intersect lines", f_lines)

    f_sp = jax.jit(lambda eps: average_spacing_jit(
        cloud.points + eps, cloud.mask, cfg.spacing_k, cfg.spacing_samples))
    timed("average_spacing", f_sp)


if __name__ == "__main__":
    main()
