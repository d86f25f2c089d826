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


def _sync(out):
    """Hard host-readback fence: block_until_ready can return before the
    remote execution finishes on this runtime (CLAUDE.md)."""
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf).ravel()[:1]
    return out


def timed(label, fn, *a, n=3, vary=None, **k):
    """Time ``fn(*a)``; ``vary`` maps (iteration, args) -> fresh args so the
    runtime's (executable, inputs) memoizer cannot serve a cached result.

    The timed program is a scalar contraction of ``fn``'s outputs: every
    output leaf feeds one on-device sum fetched as a single scalar.
    Fetching the raw pytree instead costs one tunnel round-trip PER LEAF
    (~25-45 ms each), which used to dominate every stage number here.
    """
    out = _sync(fn(*a, **k))  # raw output for downstream stages

    contracted = jax.jit(lambda *args: sum(
        jnp.sum(leaf) for leaf in jax.tree.leaves(fn(*args, **k))
        if jnp.issubdtype(leaf.dtype, jnp.number)))
    float(contracted(*a))
    t0 = time.perf_counter()
    for i in range(n):
        args = vary(i + 1, a) if vary is not None else a
        float(contracted(*args))
    print(f"{label:<28s} {(time.perf_counter() - t0) / n * 1e3:9.1f} ms",
          flush=True)
    return out


def jitter_first(i, args):
    """Default vary: nudge the first array argument by i*1e-9 (semantically
    a no-op at f32 geometry scales, but a distinct input buffer)."""
    first = args[0] + jnp.float32(i * 1e-9)
    return (first,) + tuple(args[1:])


def main():
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    tgt_cloud = pad_cloud(tp, tn, pad)
    src_cloud = pad_cloud(sp_, sn, pad)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    vary_key = lambda i, a: a[:3] + (jax.random.PRNGKey(7000 + i),) + a[4:]

    extractor = ransac._cached_extractor(cfg, pad)
    tgt_planes0 = timed("extract tgt", extractor, tgt_cloud.points,
                        tgt_cloud.normals, tgt_cloud.count, k1,
                        cfg.ransac_min_allowed_support, n=2, vary=vary_key)
    src_planes0 = extractor(src_cloud.points, src_cloud.normals,
                            src_cloud.count, k2,
                            cfg.ransac_min_allowed_support)
    tgt_planes = ransac.select_planes(tgt_planes0[0], cfg)
    src_planes = ransac.select_planes(src_planes0[0], cfg)

    spc = timed("average_spacing", average_spacing_jit, src_cloud.points,
                src_cloud.mask, cfg.spacing_k, cfg.spacing_samples,
                vary=jitter_first)
    sp = float(spc)
    dp = cfg.derived(sp)
    dsd = jnp.float32(dp.down_sample_distance)

    vary_dsd = lambda i, a: a[:2] + (a[2] + jnp.float32(i * 1e-9),) + a[3:]
    tgt_prep = timed("prepare tgt", prepare_cloud, tgt_cloud, tgt_planes,
                     dsd, cfg, vary=vary_dsd)
    src_prep = prepare_cloud(src_cloud, src_planes, dsd, cfg)
    dparams = (jnp.float32(dp.scale), jnp.float32(dp.length_threshold), dsd)

    vary_dp = lambda i, a: (a[0], a[1],
                            (a[2][0] + jnp.float32(i * 1e-9),) + a[2][1:],
                            a[3])
    timed("register_pair (full)", register_pair, tgt_prep, src_prep,
          dparams, cfg, vary=vary_dp)

    # sub-stages of register_pair; every stage takes a jittered scalar so
    # repeated calls are distinct inputs to the runtime memoizer
    cos10 = math.cos(cfg.line_pair_min_angle)
    scale = jnp.float32(dp.scale)
    lt = jnp.float32(dp.length_threshold)
    jit1 = lambda i, a: (a[0] + jnp.float32(i * 1e-9),) + tuple(a[1:])

    f_tdesc = jax.jit(lambda s: pair_descriptors(
        tgt_prep.lines, tgt_prep.planes.coeffs[:, :3], s,
        cfg.max_target_pairs, ordered=True, min_angle_cos=cos10,
        pad_value=-1e6))
    tgt_desc = timed("descriptors tgt", f_tdesc, scale, vary=jit1)
    f_sdesc = jax.jit(lambda s: pair_descriptors(
        src_prep.lines, src_prep.planes.coeffs[:, :3], s,
        cfg.max_query_pairs, ordered=False, min_angle_cos=cos10,
        pad_value=1e6))
    src_desc = timed("descriptors src", f_sdesc, scale, vary=jit1)

    f_match = jax.jit(lambda r: matching.match_descriptors(
        src_desc, tgt_desc, r, cfg.max_matches))
    matches = timed("match_descriptors", f_match,
                    jnp.float32(cfg.descriptor_match_radius), vary=jit1)
    f_hyp = jax.jit(lambda eps: jax.tree.map(
        lambda x: x + eps * 0, matching.hypothesis_poses(
            src_desc, tgt_desc, matches)))
    R, t = timed("hypothesis_poses", f_hyp, jnp.float32(0.0), vary=jit1)
    euler_tol = math.sqrt(cfg.angle_threshold / 2.0)
    f_clu = jax.jit(lambda d: matching.cluster_poses(
        R, t, matches.valid, d, euler_tol, cfg.max_pose_clusters))
    clusters = timed("cluster_poses", f_clu, lt / 2.0, vary=jit1)
    f_cons = jax.jit(lambda l: matching.plane_consistency(
        R[clusters.rep], t[clusters.rep], clusters.valid,
        src_prep.planes.coeffs, src_prep.geom.centers,
        src_prep.geom.radii, src_prep.planes.mask,
        tgt_prep.planes.coeffs, tgt_prep.geom.centers,
        tgt_prep.geom.radii, tgt_prep.planes.mask,
        src_prep.bounding_center, tgt_prep.bounding_center,
        tgt_prep.bounding_radius, l, math.cos(cfg.angle_threshold)))
    counts, _ = timed("plane_consistency", f_cons, lt, vary=jit1)
    C = counts.shape[0]
    sel, sel_valid = matching.select_candidates(
        counts, jnp.arange(C, dtype=jnp.int32), cfg.max_candidate_results)
    sR = R[clusters.rep][sel]
    st = t[clusters.rep][sel]

    f_bt = jax.jit(lambda l: penetration.build_tests(
        sR, st, sel_valid,
        src_prep.planes.coeffs, src_prep.geom.corners,
        src_prep.geom.centers, src_prep.planes.mask,
        tgt_prep.planes.coeffs, tgt_prep.geom.corners,
        tgt_prep.geom.centers, tgt_prep.planes.mask,
        l, cfg.angle_threshold, max_tests=cfg.max_penetration_tests))
    tests = timed("pen build_tests", f_bt, lt, vary=jit1)
    f_rt = jax.jit(lambda l: penetration.run_tests(
        tests, sR, st,
        src_prep.geom.ds_points, src_prep.geom.ds_counts,
        tgt_prep.geom.ds_points, tgt_prep.geom.ds_counts,
        src_prep.planes.coeffs, tgt_prep.planes.coeffs,
        search_radius=l, min_points=cfg.penetration_min_points,
        min_distance=lt / 2.0, n_samples=cfg.penetration_samples))
    pen = timed("pen run_tests", f_rt, lt, vary=jit1)

    plane_frac = counts[sel].astype(jnp.float32) / 14.0
    f_ov = jax.jit(lambda d: overlap_mod.overlap_scores(
        sR, st, sel_valid, src_prep.ds.points, src_prep.ds.count,
        tgt_prep.ds.points, tgt_prep.ds.count, d,
        plane_frac=plane_frac, face_weight=cfg.face_matches_weight,
        exact_k=cfg.overlap_exact_k, grid=cfg.overlap_grid))
    timed("overlap_scores", f_ov, dsd, vary=jit1)


if __name__ == "__main__":
    main()
