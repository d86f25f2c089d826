"""Penetration-filter diagnostic on the polyhedron pair's candidate set."""
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
from plade_tpu.verify import penetration, overlap as overlap_mod

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


def np_penetrable(R, t, splane, tplane, scorners, tcorners, spts, tpts,
                  search_radius, min_points, min_distance):
    """Reference-faithful numpy AreTwoPlanesPenetrable (util.cpp:1279-1458),
    unbounded sampling."""
    n1 = R @ splane[:3]
    d1 = splane[3] - n1 @ t
    sc = (R @ scorners.T).T + t
    sp = (R @ spts.T).T + t
    n2, d2 = tplane[:3], tplane[3]
    # intersection line
    u = np.cross(n1, n2)
    nu = np.linalg.norm(u)
    if nu < 1e-6 or abs(n1 @ n2) > 0.95:
        return None, "parallel"
    u = u / nu
    A = np.stack([n1, n2, u])
    b = -np.array([d1, d2, 0.0])
    p0 = np.linalg.lstsq(A, b, rcond=None)[0]

    def clip(corners):
        pts = []
        m = len(corners)
        for i in range(1, m + 1):
            e = corners[i % m] - corners[i - 1]
            e = e / np.linalg.norm(e)
            if abs(u @ e) > 0.9999:
                continue
            w0 = p0 - corners[i - 1]
            bb = u @ e
            dd = u @ w0
            ff = e @ w0
            den = 1 - bb * bb
            s = (bb * ff - dd) / den
            tt2 = (ff - bb * dd) / den
            ip = 0.5 * (p0 + s * u + corners[i - 1] + tt2 * e)
            if (corners[i - 1] - ip) @ (corners[i % m] - ip) > 0:
                continue
            pts.append(ip)
        return pts

    c1 = clip(sc)
    c2 = clip(tcorners)
    if len(c1) == 0 or len(c2) == 0:
        return False, "noclip"
    if len(c1) != 2 or len(c2) != 2:
        return None, "badclip"
    direc = c1[1] - c1[0]
    direc /= np.linalg.norm(direc)
    allp = c1 + c2
    proj = sorted([((p - c1[0]) @ direc, i) for i, p in enumerate(allp)])
    if proj[0][1] // 2 == proj[1][1] // 2:
        return False, "nooverlap"
    start = allp[proj[1][1]]
    length = proj[2][0] - proj[1][0]

    def side(cloud1, cloud2, pn, pd):
        pos = neg = 0
        used = np.zeros(len(cloud1), bool)
        dist = 0.0
        ns = 0
        while dist < length:
            spt = start + dist * direc
            dist += search_radius
            ns += 1
            d2o = np.linalg.norm(cloud2 - spt, axis=1)
            if (d2o <= search_radius / 2).sum() < 2:
                continue
            d2p = np.linalg.norm(cloud1 - spt, axis=1)
            for idx in np.where(d2p <= search_radius)[0]:
                if used[idx]:
                    continue
                used[idx] = True
                sd = cloud1[idx] @ pn + pd
                if abs(sd) > min_distance:
                    if sd >= 0:
                        pos += 1
                    else:
                        neg += 1
        return pos, neg, ns

    pos1, neg1, ns1 = side(sp, tpts, n2, d2)
    if pos1 < min_points or neg1 < min_points:
        return False, f"side1 {pos1}/{neg1} ns={ns1}"
    if max(pos1, neg1) / min(pos1, neg1 + 1) > 5:
        return False, f"side1ratio {pos1}/{neg1}"
    pos2, neg2, ns2 = side(tpts, sp, n1, d1)
    if pos2 < min_points and neg2 < min_points:
        return False, f"side2 {pos2}/{neg2}"
    if max(pos2, neg2) / min(pos2, neg2 + 1) > 5:
        return False, f"side2ratio {pos2}/{neg2}"
    return True, f"pen {pos1}/{neg1} {pos2}/{neg2} ns={ns1}"


def main():
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    tgt_cloud = pad_cloud(tp, tn, pad)
    src_cloud = pad_cloud(sp_, sn, pad)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    tgt_planes = ransac.auto_extract(tgt_cloud.points, tgt_cloud.normals,
                                     tgt_cloud.count, k1, cfg, pad)
    src_planes = ransac.auto_extract(src_cloud.points, src_cloud.normals,
                                     src_cloud.count, k2, cfg, pad)
    sp = float(average_spacing(src_cloud.points, src_cloud.mask,
                               cfg.spacing_k, cfg.spacing_samples))
    dp = cfg.derived(sp)
    tgt = prepare_cloud(tgt_cloud, tgt_planes,
                        jnp.float32(dp.down_sample_distance), cfg)
    src = prepare_cloud(src_cloud, src_planes,
                        jnp.float32(dp.down_sample_distance), cfg)
    scale = jnp.float32(dp.scale)
    lt = float(dp.length_threshold)

    cos10 = math.cos(cfg.line_pair_min_angle)
    tgt_desc = pair_descriptors(tgt.lines, tgt.planes.coeffs[:, :3], scale,
                                cfg.max_target_pairs, ordered=True,
                                min_angle_cos=cos10, pad_value=-1e6)
    src_desc = pair_descriptors(src.lines, src.planes.coeffs[:, :3], scale,
                                cfg.max_query_pairs, ordered=False,
                                min_angle_cos=cos10, pad_value=1e6)
    matches = matching.match_descriptors(src_desc, tgt_desc,
                                         cfg.descriptor_match_radius,
                                         cfg.max_matches)
    R, t = matching.hypothesis_poses(src_desc, tgt_desc, matches)
    euler_tol = math.sqrt(cfg.angle_threshold / 2.0)
    clusters = matching.cluster_poses(R, t, matches.valid, lt / 2.0,
                                      euler_tol, cfg.max_pose_clusters)
    cR = R[clusters.rep]
    ct = t[clusters.rep]
    counts, _ = matching.plane_consistency(
        cR, ct, clusters.valid,
        src.planes.coeffs, src.geom.centers, src.geom.radii, src.planes.mask,
        tgt.planes.coeffs, tgt.geom.centers, tgt.geom.radii, tgt.planes.mask,
        src.bounding_center, tgt.bounding_center,
        tgt.bounding_radius, jnp.float32(lt), math.cos(cfg.angle_threshold))
    C = counts.shape[0]
    sel, sel_valid = matching.select_candidates(
        counts, jnp.arange(C, dtype=jnp.int32), cfg.max_candidate_results)
    sR = cR[sel]
    st = ct[sel]

    tests = penetration.build_tests(
        sR, st, sel_valid,
        src.planes.coeffs, src.geom.corners, src.geom.centers,
        src.planes.mask,
        tgt.planes.coeffs, tgt.geom.corners, tgt.geom.centers, tgt.planes.mask,
        jnp.float32(lt), cfg.angle_threshold,
        max_tests=cfg.max_penetration_tests)
    n_tests_valid = int(np.asarray(tests.valid).sum())
    print("tests compacted:", n_tests_valid, "budget:", cfg.max_penetration_tests)
    pen = penetration.run_tests(
        tests, sR, st,
        src.geom.ds_points, src.geom.ds_counts,
        tgt.geom.ds_points, tgt.geom.ds_counts,
        src.planes.coeffs, tgt.planes.coeffs,
        search_radius=jnp.float32(lt),
        min_points=cfg.penetration_min_points,
        min_distance=jnp.float32(lt) / 2.0,
        n_samples=cfg.penetration_samples)
    rejected = penetration.rejected_candidates(tests, pen,
                                               cfg.max_candidate_results)
    rej = np.asarray(rejected)
    svn = np.asarray(sel_valid)
    sRn = np.asarray(sR)
    stn = np.asarray(st)
    errs = np.array([rot_err(sRn[i]) for i in range(len(sRn))])
    terrs = np.linalg.norm(stn - tg, axis=-1)
    near = (errs < 5) & (terrs < 5 * lt) & svn
    print("selected:", svn.sum(), "rejected:", (rej & svn).sum(),
          "near-GT selected:", near.sum(),
          "near-GT rejected:", (near & rej).sum())

    # overlap of survivors; find the wrong winner
    sel_counts = np.asarray(counts)[np.asarray(sel)]
    plane_frac = sel_counts / max(float(src_planes.count), 1.0)
    alive = svn & ~rej
    ov = overlap_mod.overlap_scores(
        sR, st, jnp.asarray(alive), src.ds.points, src.ds.count,
        tgt.ds.points, tgt.ds.count, jnp.float32(dp.down_sample_distance),
        plane_frac=jnp.asarray(plane_frac, jnp.float32),
        face_weight=cfg.face_matches_weight,
        exact_k=cfg.overlap_exact_k, grid=cfg.overlap_grid)
    ovn = np.asarray(ov)
    score = cfg.face_matches_weight * plane_frac + 0.8 * ovn
    score[~alive] = -np.inf
    win = int(np.argmax(score))
    print(f"winner: idx {win} rot_err {errs[win]:.2f} trans_err {terrs[win]:.4f} "
          f"score {score[win]:.4f} ov {ovn[win]:.4f} planes {sel_counts[win]}")
    gt_alive = np.where(near & alive)[0]
    print("near-GT survivors:", gt_alive[:10],
          "their scores:", score[gt_alive[:10]])

    # reference-faithful numpy penetration on the winner (if wrong)
    spts = np.asarray(src.geom.ds_points)
    scnt = np.asarray(src.geom.ds_counts)
    tpts = np.asarray(tgt.geom.ds_points)
    tcnt = np.asarray(tgt.geom.ds_counts)
    scoef = np.asarray(src.planes.coeffs)
    tcoef = np.asarray(tgt.planes.coeffs)
    scorn = np.asarray(src.geom.corners)
    tcorn = np.asarray(tgt.geom.corners)
    nsp = int(src_planes.count)
    ntp = int(tgt_planes.count)

    for label, ci in [("winner", win)] + \
            [(f"nearGT{j}", int(j)) for j in gt_alive[:2]]:
        Rw, tw = sRn[ci], stn[ci]
        sc_ = (Rw @ np.asarray(src.bounding_center)) + tw
        verdicts = []
        for i in range(nsp):
            n1 = Rw @ scoef[i, :3]
            d1 = scoef[i, 3] - n1 @ tw
            cen = Rw @ np.asarray(src.geom.centers)[i] + tw
            for j in range(ntp):
                c2pd = 0.5 * (abs(tcoef[j, :3] @ cen + tcoef[j, 3]) +
                              abs(n1 @ np.asarray(tgt.geom.centers)[j] + d1))
                if c2pd < lt and n1 @ tcoef[j, :3] > cfg.angle_threshold:
                    continue
                v, why = np_penetrable(
                    Rw, tw, scoef[i], tcoef[j], scorn[i], tcorn[j],
                    spts[i][:scnt[i]], tpts[j][:tcnt[j]],
                    lt, cfg.penetration_min_points, lt / 2.0)
                if v:
                    verdicts.append((i, j, why))
        print(f"{label} (rot_err {errs[ci]:.1f}): numpy-ref penetrable pairs:",
              verdicts[:5], "total", len(verdicts))


if __name__ == "__main__":
    main()
