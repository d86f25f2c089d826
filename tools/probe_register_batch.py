"""Cumulative-stage bisection of the REGISTER tail, vmapped, B=1 vs B=8.

Each program adds one more stage inside one jit; consecutive deltas are
per-stage costs.  All inputs are jit ARGUMENTS (a closed-over pytree
becomes a baked constant this runtime re-uploads per call — CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_register_batch.py
"""
import math
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
from plade_tpu.io.synthetic import make_scan_sequence
from plade_tpu.extract import ransac
from plade_tpu.knn.bruteforce import average_spacing
from plade_tpu.pipeline import _pad_size, prepare_cloud
from plade_tpu.descriptors.pairlines import pair_descriptors
from plade_tpu.match import matching
from plade_tpu.verify import overlap as overlap_mod
from plade_tpu.verify import penetration

SAMPLE = "/root/reference/sample_data"
cfg = PladeConfig()


def build_prep(tp, tn, sp_, sn_, pad, seed):
    tc = pad_cloud(tp, tn, pad)
    sc = pad_cloud(sp_, sn_, pad)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    tpl = ransac.auto_extract(tc.points, tc.normals, tc.count, k1, cfg, pad)
    spl = ransac.auto_extract(sc.points, sc.normals, sc.count, k2, cfg, pad)
    spc = float(average_spacing(sc.points, sc.mask, cfg.spacing_k,
                                cfg.spacing_samples))
    dp = cfg.derived(spc)
    dsd = jnp.float32(dp.down_sample_distance)
    return (prepare_cloud(tc, tpl, dsd, cfg),
            prepare_cloud(sc, spl, dsd, cfg),
            np.float32(dp.scale), np.float32(dp.length_threshold),
            np.float32(dp.down_sample_distance))


def make_stage(upto: int):
    cos10 = math.cos(cfg.line_pair_min_angle)
    euler_tol = math.sqrt(cfg.angle_threshold / 2.0)

    def one(tgt, src, scale, lt, dsd, eps):
        scale = scale + eps
        td = pair_descriptors(tgt.lines, tgt.planes.coeffs[:, :3], scale,
                              cfg.max_target_pairs, ordered=True,
                              min_angle_cos=cos10, pad_value=-1e6)
        sd = pair_descriptors(src.lines, src.planes.coeffs[:, :3], scale,
                              cfg.max_query_pairs, ordered=False,
                              min_angle_cos=cos10, pad_value=1e6)
        m = matching.match_descriptors(sd, td, cfg.descriptor_match_radius,
                                       cfg.max_matches,
                                       per_query=cfg.match_per_query)
        R, t = matching.hypothesis_poses(sd, td, m)
        acc = jnp.sum(R) + jnp.sum(t) + m.count.astype(jnp.float32)
        if upto == 1:
            return acc
        HB = min(cfg.max_cluster_hypotheses, R.shape[0])
        cl = matching.cluster_poses(R[:HB], t[:HB], m.valid[:HB], lt / 2.0,
                                    euler_tol, cfg.max_pose_clusters)
        cR = R[cl.rep]
        ct = t[cl.rep]
        acc = acc + jnp.sum(cR) + jnp.sum(ct)
        if upto == 2:
            return acc
        counts, _ = matching.plane_consistency(
            cR, ct, cl.valid, src.planes.coeffs, src.geom.centers,
            src.geom.radii, src.planes.mask, tgt.planes.coeffs,
            tgt.geom.centers, tgt.geom.radii, tgt.planes.mask,
            src.bounding_center, tgt.bounding_center, tgt.bounding_radius,
            lt, math.cos(cfg.angle_threshold))
        sel, sel_valid = matching.select_candidates(
            counts, jnp.arange(counts.shape[0], dtype=jnp.int32),
            cfg.max_candidate_results)
        sR = cR[sel]
        st = ct[sel]
        acc = acc + jnp.sum(sR) + jnp.sum(counts)
        if upto == 3:
            return acc
        tests = penetration.build_tests(
            sR, st, sel_valid, src.planes.coeffs, src.geom.corners,
            src.geom.centers, src.planes.mask, tgt.planes.coeffs,
            tgt.geom.corners, tgt.geom.centers, tgt.planes.mask,
            lt, cfg.angle_threshold, max_tests=cfg.max_penetration_tests)
        pen = penetration.run_tests(
            tests, sR, st, src.geom.ds_points, src.geom.ds_counts,
            tgt.geom.ds_points, tgt.geom.ds_counts,
            src.planes.coeffs, tgt.planes.coeffs, search_radius=lt,
            min_points=cfg.penetration_min_points, min_distance=lt / 2.0,
            n_samples=cfg.penetration_samples,
            max_ratio=cfg.penetration_ratio)
        rej = penetration.rejected_candidates(tests, pen,
                                              cfg.max_candidate_results)
        sel_valid = sel_valid & ~rej
        acc = acc + jnp.sum(rej.astype(jnp.float32))
        if upto == 4:
            return acc
        plane_frac = counts[sel].astype(jnp.float32) / jnp.maximum(
            src.planes.count.astype(jnp.float32), 1.0)
        ov, ova = overlap_mod.overlap_scores(
            sR, st, sel_valid, src.ds.points, src.ds.count,
            tgt.ds.points, tgt.ds.count, dsd, plane_frac=plane_frac,
            face_weight=cfg.face_matches_weight,
            exact_k=cfg.overlap_exact_k, grid=cfg.overlap_grid,
            src_normals=src.ds.normals, tgt_normals=tgt.ds.normals,
            normal_cos=cfg.overlap_normal_cos, return_approx=True)
        acc = acc + jnp.sum(ov) + jnp.sum(ova)
        if upto == 5:
            return acc
        raise ValueError(upto)

    return one


def main():
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn_ = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    preps = [build_prep(tp, tn, sp_, sn_, pad, 0)]
    for b in range(1, 8):
        srng = np.random.default_rng(1000 + b)
        scans, _ = make_scan_sequence(
            srng, n_scans=2, n_points=min(pad, 100000), overlap_radius=3.4,
            step=2.0, n_rooms=3, n_per_plane=9000, noise=0.02, size=4.0,
            extra_planes=3, normal_noise_deg=3.0, max_angle=1.0,
            max_trans=0.6)
        preps.append(build_prep(scans[0][0], scans[0][1],
                                scans[1][0], scans[1][1], pad, b))

    base = int.from_bytes(os.urandom(4), "little") % (1 << 20)
    names = {1: "desc+match+hyp", 2: "+cluster", 3: "+consist+select",
             4: "+penetration", 5: "+overlap"}
    for B in (1, 8):
        tgt_b = jax.tree.map(lambda *x: jnp.stack(x),
                             *[p[0] for p in preps[:B]])
        src_b = jax.tree.map(lambda *x: jnp.stack(x),
                             *[p[1] for p in preps[:B]])
        sc_b = jnp.asarray([p[2] for p in preps[:B]])
        lt_b = jnp.asarray([p[3] for p in preps[:B]])
        dsd_b = jnp.asarray([p[4] for p in preps[:B]])
        prev = 0.0
        for upto in (1, 2, 3, 4, 5):
            f = jax.jit(jax.vmap(make_stage(upto),
                                 in_axes=(0, 0, 0, 0, 0, None)))
            float(jnp.sum(f(tgt_b, src_b, sc_b, lt_b, dsd_b,
                            jnp.float32(0.0))))
            t0 = time.perf_counter()
            n = 3
            for i in range(n):
                float(jnp.sum(f(tgt_b, src_b, sc_b, lt_b, dsd_b,
                                jnp.float32((base + i) * 1e-12))))
            dt = (time.perf_counter() - t0) / n * 1e3
            print(f"B={B} upto {names[upto]:16s} {dt:8.1f} ms "
                  f"(delta {dt - prev:7.1f})", flush=True)
            prev = dt


if __name__ == "__main__":
    main()
