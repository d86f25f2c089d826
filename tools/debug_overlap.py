"""Numpy ground-truth check of the overlap computation at the GT pose."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from plade_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from plade_tpu.core.config import PladeConfig
from plade_tpu.core.types import pad_cloud
from plade_tpu.io.ply import read_ply
from plade_tpu.geometry.voxel import voxel_downsample
from plade_tpu.knn.bruteforce import average_spacing

GT = np.array([
    [-0.50608, 0.86067, 0.05595, -0.25258],
    [0.82135, 0.50072, -0.27326, 0.86333],
    [-0.26320, -0.09234, -0.96031, 0.15475],
    [0.0, 0.0, 0.0, 1.0]])
SAMPLE = "/root/reference/sample_data"


def nn_frac(q, p, r):
    """Fraction of q with a p-neighbor within r (chunked numpy)."""
    cnt = 0
    for s in range(0, len(q), 1024):
        blk = q[s:s + 1024]
        d2 = ((blk[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        cnt += (d2.min(1) <= r * r).sum()
    return cnt / min(len(q), len(p))


def main():
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    from plade_tpu.pipeline import _pad_size
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    tgt_cloud = pad_cloud(tp, tn, pad)
    src_cloud = pad_cloud(sp_, sn, pad)
    sp = float(average_spacing(src_cloud.points, src_cloud.mask,
                               cfg.spacing_k, cfg.spacing_samples))
    dsd = cfg.downsample_factor * sp
    print("spacing", sp, "dsd", dsd)
    tds = voxel_downsample(tgt_cloud.points, tgt_cloud.mask, jnp.float32(dsd),
                           cfg.max_ds_points)
    sds = voxel_downsample(src_cloud.points, src_cloud.mask, jnp.float32(dsd),
                           cfg.max_ds_points)
    tn_ = np.asarray(tds.points)[:int(tds.count)]
    sn_ = np.asarray(sds.points)[:int(sds.count)]
    print("ds counts:", len(tn_), len(sn_), "of caps", cfg.max_ds_points)
    q = (GT[:3, :3] @ sn_.T).T + GT[:3, 3]
    print("overlap at GT (numpy exact):", nn_frac(q, tn_, dsd))
    # raw-cloud overlap sanity (2k sample)
    idx = np.random.default_rng(0).choice(len(sp_), 2000, replace=False)
    qr = (GT[:3, :3] @ sp_[idx].T).T + GT[:3, 3]
    cnt = 0
    for s in range(0, len(qr), 256):
        blk = qr[s:s + 256]
        d2 = ((blk[:, None, :] - tp[None, :, :]) ** 2).sum(-1)
        cnt += (d2.min(1) <= dsd * dsd).sum()
    print("raw-cloud source->target inlier frac (r=dsd):", cnt / len(qr))


if __name__ == "__main__":
    main()
