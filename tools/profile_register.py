"""Honest per-substage timing of register_pair (inputs varied per call to
defeat the runtime's execution memoization; hard host-sync each call)."""
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
from plade_tpu.knn.bruteforce import average_spacing
from plade_tpu.pipeline import _pad_size, _prepare_cloud_impl
from plade_tpu.descriptors.pairlines import pair_descriptors
from plade_tpu.match import matching
from plade_tpu.verify import penetration, overlap as overlap_mod

SAMPLE = "/root/reference/sample_data"


def timed(label, fn, n=3):
    out = fn(0)
    jax.tree.map(lambda x: np.asarray(x[..., :1]) if hasattr(x, 'shape')
                 and x.ndim else np.asarray(x), jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf)  # hard sync
    print(f"{label:<22s} {(time.perf_counter() - t0) / n * 1e3:9.1f} ms")
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
    ext = jax.jit(ransac.build_extract_fn(cfg, pad, max_extract=64))
    floor = jnp.int32(cfg.ransac_min_allowed_support)
    tgt_planes = ransac.select_planes(
        ext(tgt_cloud.points, tgt_cloud.normals, tgt_cloud.count, k1, floor)[0],
        cfg)
    src_planes = ransac.select_planes(
        ext(src_cloud.points, src_cloud.normals, src_cloud.count, k2, floor)[0],
        cfg)
    spc = float(average_spacing(src_cloud.points, src_cloud.mask,
                                cfg.spacing_k, cfg.spacing_samples))
    dp = cfg.derived(spc)
    eps = 1e-9  # per-call jitter (defeats memoization, negligible semantics)

    @jax.jit
    def prep(c, pl, dsd):
        return _prepare_cloud_impl(c, pl, dsd, cfg)

    tgt_prep = timed("prepare tgt", lambda i: prep(
        tgt_cloud, tgt_planes, jnp.float32(dp.down_sample_distance + i * eps)))
    src_prep = prep(src_cloud, src_planes,
                    jnp.float32(dp.down_sample_distance))

    cos10 = math.cos(cfg.line_pair_min_angle)

    @jax.jit
    def desc_t(scale):
        return pair_descriptors(tgt_prep.lines, tgt_prep.planes.coeffs[:, :3],
                                scale, cfg.max_target_pairs, ordered=True,
                                min_angle_cos=cos10, pad_value=-1e6)

    @jax.jit
    def desc_s(scale):
        return pair_descriptors(src_prep.lines, src_prep.planes.coeffs[:, :3],
                                scale, cfg.max_query_pairs, ordered=False,
                                min_angle_cos=cos10, pad_value=1e6)

    tgt_desc = timed("descriptors tgt",
                     lambda i: desc_t(jnp.float32(dp.scale + i * eps)))
    src_desc = timed("descriptors src",
                     lambda i: desc_s(jnp.float32(dp.scale + i * eps)))

    @jax.jit
    def match(r):
        return matching.match_descriptors(src_desc, tgt_desc, r,
                                          cfg.max_matches)

    matches = timed("match", lambda i: match(
        jnp.float32(cfg.descriptor_match_radius + i * eps)))

    @jax.jit
    def hyp(o):
        R, t = matching.hypothesis_poses(src_desc, tgt_desc, matches)
        return R + o, t

    R, t = timed("hypotheses", lambda i: hyp(jnp.float32(i * eps)))
    euler_tol = math.sqrt(cfg.angle_threshold / 2.0)

    @jax.jit
    def clus(tol):
        return matching.cluster_poses(R, t, matches.valid, tol, euler_tol,
                                      cfg.max_pose_clusters)

    clusters = timed("cluster", lambda i: clus(
        jnp.float32(dp.length_threshold / 2.0 + i * eps)))

    @jax.jit
    def cons(lt):
        return matching.plane_consistency(
            R[clusters.rep], t[clusters.rep], clusters.valid,
            src_prep.planes.coeffs, src_prep.geom.centers,
            src_prep.geom.radii, src_prep.planes.mask,
            tgt_prep.planes.coeffs, tgt_prep.geom.centers,
            tgt_prep.geom.radii, tgt_prep.planes.mask,
            src_prep.bounding_center, tgt_prep.bounding_center,
            tgt_prep.bounding_radius, lt, math.cos(cfg.angle_threshold))

    counts, _ = timed("consistency", lambda i: cons(
        jnp.float32(dp.length_threshold + i * eps)))
    C = counts.shape[0]
    sel, sel_valid = matching.select_candidates(
        counts, jnp.arange(C, dtype=jnp.int32), cfg.max_candidate_results)
    sR = R[clusters.rep][sel]
    st = t[clusters.rep][sel]

    @jax.jit
    def build(lt):
        return penetration.build_tests(
            sR, st, sel_valid,
            src_prep.planes.coeffs, src_prep.geom.corners,
            src_prep.geom.centers, src_prep.planes.mask,
            tgt_prep.planes.coeffs, tgt_prep.geom.corners,
            tgt_prep.geom.centers, tgt_prep.planes.mask,
            lt, cfg.angle_threshold, max_tests=cfg.max_penetration_tests)

    tests = timed("pen build", lambda i: build(
        jnp.float32(dp.length_threshold + i * eps)))

    @jax.jit
    def runt(lt):
        return penetration.run_tests(
            tests, sR, st,
            src_prep.geom.ds_points, src_prep.geom.ds_counts,
            tgt_prep.geom.ds_points, tgt_prep.geom.ds_counts,
            src_prep.planes.coeffs, tgt_prep.planes.coeffs,
            search_radius=lt, min_points=cfg.penetration_min_points,
            min_distance=lt / 2.0, n_samples=cfg.penetration_samples)

    timed("pen run", lambda i: runt(
        jnp.float32(dp.length_threshold + i * eps)))

    plane_frac = counts[sel].astype(jnp.float32) / 14.0

    @jax.jit
    def ovl(dsd):
        return overlap_mod.overlap_scores(
            sR, st, sel_valid, src_prep.ds.points, src_prep.ds.count,
            tgt_prep.ds.points, tgt_prep.ds.count, dsd,
            plane_frac=plane_frac, face_weight=cfg.face_matches_weight,
            exact_k=cfg.overlap_exact_k, grid=cfg.overlap_grid)

    timed("overlap", lambda i: ovl(
        jnp.float32(dp.down_sample_distance + i * eps)))


if __name__ == "__main__":
    main()
