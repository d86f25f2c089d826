"""Diagnose synthetic_room[1]: cluster structure under single-linkage."""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import math
import jax.numpy as jnp
import numpy as np

from plade_tpu.core.types import pad_cloud
from plade_tpu.extract import ransac
from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud
from plade_tpu.knn.bruteforce import average_spacing
from plade_tpu.match import matching
from plade_tpu.pipeline import _pad_size, prepare_cloud
from plade_tpu.descriptors.pairlines import pair_descriptors

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_pipeline import SMALL_CFG  # noqa: E402

cfg = SMALL_CFG
seed = 1
rng = np.random.default_rng(seed)
pts, nrm, _ = make_room(rng, n_per_plane=1400, noise=0.003, extra_planes=3)
R_gt, t_gt = random_rigid(rng, max_angle=2.5, max_trans=1.5)
Rinv = R_gt.T
tinv = -R_gt.T @ t_gt
spts, snrm = transform_cloud(pts, nrm, Rinv, tinv)
spts = spts + rng.normal(scale=0.002, size=spts.shape).astype(np.float32)

pad = _pad_size(max(pts.shape[0], spts.shape[0]), maximum=cfg.max_points)
tgt_cloud = pad_cloud(pts, nrm, pad)
src_cloud = pad_cloud(spts, snrm, pad)
k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
tgt_planes = ransac.auto_extract(tgt_cloud.points, tgt_cloud.normals,
                                 tgt_cloud.count, k1, cfg, pad)
src_planes = ransac.auto_extract(src_cloud.points, src_cloud.normals,
                                 src_cloud.count, k2, cfg, pad)
print(f"planes: tgt {int(tgt_planes.count)} src {int(src_planes.count)}")
sp = float(average_spacing(src_cloud.points, src_cloud.mask,
                           cfg.spacing_k, cfg.spacing_samples))
dp = cfg.derived(sp)
dsd = jnp.float32(dp.down_sample_distance)
tgt_prep = prepare_cloud(tgt_cloud, tgt_planes, dsd, cfg)
src_prep = prepare_cloud(src_cloud, src_planes, dsd, cfg)
cos10 = math.cos(cfg.line_pair_min_angle)
scale = jnp.float32(dp.scale)
tgt_desc = pair_descriptors(tgt_prep.lines, tgt_prep.planes.coeffs[:, :3],
                            scale, cfg.max_target_pairs, ordered=True,
                            min_angle_cos=cos10, pad_value=-1e6)
src_desc = pair_descriptors(src_prep.lines, src_prep.planes.coeffs[:, :3],
                            scale, cfg.max_query_pairs, ordered=False,
                            min_angle_cos=cos10, pad_value=1e6)
matches = matching.match_descriptors(src_desc, tgt_desc,
                                     cfg.descriptor_match_radius,
                                     cfg.max_matches)
print(f"matches {int(matches.count)} saturated {int(matches.saturated)}")
R, t = matching.hypothesis_poses(src_desc, tgt_desc, matches)
mval = np.asarray(matches.valid)
Rn, tn = np.asarray(R), np.asarray(t)
cosang = (np.trace(np.einsum('ij,mjk->mik', R_gt.T, Rn),
                   axis1=1, axis2=2) - 1) / 2
rot_err = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
t_err = np.linalg.norm(tn - t_gt, axis=1)
good = mval & (rot_err < 3.0) & (t_err < 0.15)
print(f"good hyps {int(good.sum())} / {int(mval.sum())}")

euler_tol = math.sqrt(cfg.angle_threshold / 2.0)
cl = matching.cluster_poses(R, t, matches.valid, dp.length_threshold / 2.0,
                            euler_tol, cfg.max_pose_clusters)
crep = np.asarray(cl.rep)
csz = np.asarray(cl.size)
cval = np.asarray(cl.valid)
print(f"clusters {int(cval.sum())}; sizes of top10: {csz[:10]}")
for i in range(min(10, int(cval.sum()))):
    r = crep[i]
    print(f"  cl[{i}] size={csz[i]} rep_rot={rot_err[r]:.1f} "
          f"rep_terr={t_err[r]:.3f} rep_good={bool(good[r])}")
good_in_top = [bool(good[crep[i]]) for i in range(int(cval.sum()))]
print(f"any good rep: {any(good_in_top)}")
