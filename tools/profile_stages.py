"""Per-stage wall timing of the device pipeline on the sample pair."""
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from plade_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from plade_tpu.core.config import PladeConfig
from plade_tpu.core.types import pad_cloud
from plade_tpu.io.ply import read_ply
from plade_tpu.extract import ransac
from plade_tpu.knn.bruteforce import average_spacing_jit
from plade_tpu.pipeline import prepare_cloud, register_pair, _pad_size
from plade_tpu.descriptors.pairlines import pair_descriptors
from plade_tpu.match import matching
from plade_tpu.verify import penetration, overlap as overlap_mod

SAMPLE = "/root/reference/sample_data"


def timed(label, fn, *a, n=3, **k):
    out = fn(*a, **k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a, **k)
        jax.block_until_ready(out)
    print(f"{label:<28s} {(time.perf_counter() - t0) / n * 1e3:9.1f} ms")
    return out


def main():
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    tgt_cloud = pad_cloud(tp, tn, pad)
    src_cloud = pad_cloud(sp_, sn, pad)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    extractor = ransac._cached_extractor(cfg, pad)
    tgt_planes0 = timed("extract tgt", extractor, tgt_cloud.points,
                        tgt_cloud.normals, tgt_cloud.count, k1,
                        cfg.ransac_min_allowed_support, n=2)
    src_planes0 = extractor(src_cloud.points, src_cloud.normals,
                            src_cloud.count, k2,
                            cfg.ransac_min_allowed_support)
    tgt_planes = ransac.select_planes(tgt_planes0[0], cfg)
    src_planes = ransac.select_planes(src_planes0[0], cfg)

    spc = timed("average_spacing", average_spacing_jit, src_cloud.points,
                src_cloud.mask, cfg.spacing_k, cfg.spacing_samples)
    sp = float(spc)
    dp = cfg.derived(sp)
    dsd = jnp.float32(dp.down_sample_distance)

    tgt_prep = timed("prepare tgt", prepare_cloud, tgt_cloud, tgt_planes,
                     dsd, cfg)
    src_prep = prepare_cloud(src_cloud, src_planes, dsd, cfg)
    dparams = (jnp.float32(dp.scale), jnp.float32(dp.length_threshold), dsd)

    timed("register_pair (full)", register_pair, tgt_prep, src_prep,
          dparams, cfg)

    # sub-stages of register_pair
    cos10 = math.cos(cfg.line_pair_min_angle)
    scale = jnp.float32(dp.scale)
    lt = jnp.float32(dp.length_threshold)

    f_tdesc = jax.jit(lambda: pair_descriptors(
        tgt_prep.lines, tgt_prep.planes.coeffs[:, :3], scale,
        cfg.max_target_pairs, ordered=True, min_angle_cos=cos10,
        pad_value=-1e6))
    tgt_desc = timed("descriptors tgt", f_tdesc)
    f_sdesc = jax.jit(lambda: pair_descriptors(
        src_prep.lines, src_prep.planes.coeffs[:, :3], scale,
        cfg.max_query_pairs, ordered=False, min_angle_cos=cos10,
        pad_value=1e6))
    src_desc = timed("descriptors src", f_sdesc)

    matches = timed("match_descriptors", jax.jit(
        lambda: matching.match_descriptors(
            src_desc, tgt_desc, cfg.descriptor_match_radius,
            cfg.max_matches)))
    R, t = timed("hypothesis_poses", jax.jit(
        lambda: matching.hypothesis_poses(src_desc, tgt_desc, matches)))
    euler_tol = math.sqrt(cfg.angle_threshold / 2.0)
    clusters = timed("cluster_poses", jax.jit(
        lambda: matching.cluster_poses(R, t, matches.valid,
                                       lt / 2.0, euler_tol,
                                       cfg.max_pose_clusters)))
    counts, _ = timed("plane_consistency", jax.jit(
        lambda: matching.plane_consistency(
            R[clusters.rep], t[clusters.rep], clusters.valid,
            src_prep.planes.coeffs, src_prep.geom.centers,
            src_prep.geom.radii, src_prep.planes.mask,
            tgt_prep.planes.coeffs, tgt_prep.geom.centers,
            tgt_prep.geom.radii, tgt_prep.planes.mask,
            src_prep.bounding_center, tgt_prep.bounding_center,
            tgt_prep.bounding_radius, lt, math.cos(cfg.angle_threshold))))
    C = counts.shape[0]
    sel, sel_valid = matching.select_candidates(
        counts, jnp.arange(C, dtype=jnp.int32), cfg.max_candidate_results)
    sR = R[clusters.rep][sel]
    st = t[clusters.rep][sel]

    tests = timed("pen build_tests", jax.jit(
        lambda: penetration.build_tests(
            sR, st, sel_valid,
            src_prep.planes.coeffs, src_prep.geom.corners,
            src_prep.geom.centers, src_prep.planes.mask,
            tgt_prep.planes.coeffs, tgt_prep.geom.corners,
            tgt_prep.geom.centers, tgt_prep.planes.mask,
            lt, cfg.angle_threshold, max_tests=cfg.max_penetration_tests)))
    pen = timed("pen run_tests", jax.jit(
        lambda: penetration.run_tests(
            tests, sR, st,
            src_prep.geom.ds_points, src_prep.geom.ds_counts,
            tgt_prep.geom.ds_points, tgt_prep.geom.ds_counts,
            src_prep.planes.coeffs, tgt_prep.planes.coeffs,
            search_radius=lt, min_points=cfg.penetration_min_points,
            min_distance=lt / 2.0, n_samples=cfg.penetration_samples)))

    plane_frac = counts[sel].astype(jnp.float32) / 14.0
    timed("overlap_scores", jax.jit(
        lambda: overlap_mod.overlap_scores(
            sR, st, sel_valid, src_prep.ds.points, src_prep.ds.count,
            tgt_prep.ds.points, tgt_prep.ds.count, dsd,
            plane_frac=plane_frac, face_weight=cfg.face_matches_weight,
            exact_k=cfg.overlap_exact_k, grid=cfg.overlap_grid)))


if __name__ == "__main__":
    main()
