"""Staged diagnostic: where does the GT pose get lost on the polyhedron pair?"""
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
from plade_tpu.pipeline import prepare_cloud, _pad_size
from plade_tpu.descriptors.pairlines import pair_descriptors
from plade_tpu.match import matching

GT = np.array([
    [-0.50608, 0.86067, 0.05595, -0.25258],
    [0.82135, 0.50072, -0.27326, 0.86333],
    [-0.26320, -0.09234, -0.96031, 0.15475],
    [0.0, 0.0, 0.0, 1.0]])
Rg, tg = GT[:3, :3], GT[:3, 3]

SAMPLE = "/root/reference/sample_data"


def rot_err(R):
    c = (np.trace(Rg.T @ R) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))


def main():
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    tgt_cloud = pad_cloud(tp, tn, pad)
    src_cloud = pad_cloud(sp_, sn, pad)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    t0 = time.time()
    tgt_planes = ransac.auto_extract(tgt_cloud.points, tgt_cloud.normals,
                                     tgt_cloud.count, k1, cfg, pad)
    src_planes = ransac.auto_extract(src_cloud.points, src_cloud.normals,
                                     src_cloud.count, k2, cfg, pad)
    print("extract wall:", time.time() - t0)
    ntp = int(tgt_planes.count); nsp = int(src_planes.count)
    print("planes:", ntp, nsp)

    tc = np.asarray(tgt_planes.coeffs)[:ntp]
    sc = np.asarray(src_planes.coeffs)[:nsp]
    # map source planes through GT: n' = Rg n, d' = d - n'.t
    spn = (Rg @ sc[:, :3].T).T
    spd = sc[:, 3] - spn @ tg
    print("\n-- source planes under GT vs target planes --")
    for i in range(nsp):
        dots = tc[:, :3] @ spn[i]
        dd = np.abs(tc[:, 3] - spd[i])
        j = np.argmax(dots - 10 * dd)
        print(f"src {i}: best tgt {j} cos={dots[j]:+.4f} d_diff={dd[j]:.4f}")

    sp = float(average_spacing(src_cloud.points, src_cloud.mask,
                               cfg.spacing_k, cfg.spacing_samples))
    dp = cfg.derived(sp)
    print("spacing", sp, "dsd", dp.down_sample_distance,
          "lt", dp.length_threshold, "scale", dp.scale)

    tgt_prep = prepare_cloud(tgt_cloud, tgt_planes,
                             jnp.float32(dp.down_sample_distance), cfg)
    src_prep = prepare_cloud(src_cloud, src_planes,
                             jnp.float32(dp.down_sample_distance), cfg)
    print("lines:", int(tgt_prep.lines.count), int(src_prep.lines.count))

    cos10 = math.cos(cfg.line_pair_min_angle)
    tgt_desc = pair_descriptors(tgt_prep.lines, tgt_prep.planes.coeffs[:, :3],
                                jnp.float32(dp.scale), cfg.max_target_pairs,
                                ordered=True, min_angle_cos=cos10,
                                pad_value=-1e6)
    src_desc = pair_descriptors(src_prep.lines, src_prep.planes.coeffs[:, :3],
                                jnp.float32(dp.scale), cfg.max_query_pairs,
                                ordered=False, min_angle_cos=cos10,
                                pad_value=1e6)
    print("pairs:", int(tgt_desc.count), int(src_desc.count))

    matches = matching.match_descriptors(src_desc, tgt_desc,
                                         cfg.descriptor_match_radius,
                                         cfg.max_matches)
    print("matches:", int(matches.count))
    R, t = matching.hypothesis_poses(src_desc, tgt_desc, matches)
    Rn = np.asarray(R); tn_ = np.asarray(t)
    valid = np.asarray(matches.valid)
    errs = np.array([rot_err(Rn[i]) if valid[i] else 999.0
                     for i in range(len(valid))])
    terrs = np.linalg.norm(tn_ - tg, axis=-1)
    good = (errs < 5.0) & (terrs < 5 * dp.length_threshold)
    print("hypotheses:", valid.sum(), "min rot err:", errs.min(),
          "near-GT count:", good.sum())
    if good.sum():
        i = np.argmin(np.where(good, errs, 999))
        print("best near-GT hyp:", errs[i], terrs[i])

    # clustering
    euler_tol = math.sqrt(cfg.angle_threshold / 2.0)
    clusters = matching.cluster_poses(
        R, t, matches.valid, dp.length_threshold / 2.0, euler_tol,
        cfg.max_pose_clusters)
    cR = np.asarray(R[clusters.rep]); ct = np.asarray(t[clusters.rep])
    cvalid = np.asarray(clusters.valid)
    cerrs = np.array([rot_err(cR[i]) if cvalid[i] else 999.0
                      for i in range(len(cvalid))])
    cterrs = np.linalg.norm(ct - tg, axis=-1)
    cgood = (cerrs < 5.0) & (cterrs < 5 * dp.length_threshold)
    print("cluster reps:", cvalid.sum(), "min rep rot err:", cerrs.min(),
          "near-GT reps:", cgood.sum())

    counts, _ = matching.plane_consistency(
        R[clusters.rep], t[clusters.rep], clusters.valid,
        src_prep.planes.coeffs, src_prep.geom.centers, src_prep.geom.radii,
        src_prep.planes.mask,
        tgt_prep.planes.coeffs, tgt_prep.geom.centers, tgt_prep.geom.radii,
        tgt_prep.planes.mask,
        src_prep.bounding_center, tgt_prep.bounding_center,
        tgt_prep.bounding_radius, jnp.float32(dp.length_threshold),
        math.cos(cfg.angle_threshold))
    counts_n = np.asarray(counts)
    print("consistency counts: max", counts_n.max())
    if cgood.sum():
        print("near-GT rep counts:", counts_n[cgood],
              "their rot errs:", cerrs[cgood])

    # overlap at GT pose vs at winner
    from plade_tpu.verify import overlap as overlap_mod
    Rs = jnp.stack([jnp.asarray(Rg, jnp.float32),
                    jnp.asarray(Rn[np.argmin(errs)], jnp.float32)])
    ts = jnp.stack([jnp.asarray(tg, jnp.float32),
                    jnp.asarray(tn_[np.argmin(errs)], jnp.float32)])
    ov = overlap_mod.overlap_scores(
        Rs, ts, jnp.ones(2, bool),
        src_prep.ds.points, src_prep.ds.count,
        tgt_prep.ds.points, tgt_prep.ds.count,
        jnp.float32(dp.down_sample_distance),
        plane_frac=jnp.ones(2), face_weight=cfg.face_matches_weight,
        exact_k=2, grid=cfg.overlap_grid)
    print("overlap at GT pose:", float(ov[0]),
          " at best hyp:", float(ov[1]))
    np.savez("/tmp/dbg_stages.npz", tc=tc, sc=sc,
             tdesc=np.asarray(tgt_desc.desc), sdesc=np.asarray(src_desc.desc),
             terr=cerrs, counts=counts_n)


if __name__ == "__main__":
    main()
