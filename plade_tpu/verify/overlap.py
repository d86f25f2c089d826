"""Overlap scoring of candidate transforms.

Replaces ``ComputeOverlap`` (code/PLADE/util.h:611-647) and its calling loop
(plade.cpp:545-575): per candidate, the fraction of downsampled source
points that land within ``inlier_distance`` of a downsampled target point,
normalized by min(|source|, |target|).

The reference builds a fresh KD-tree per candidate over the sphere-clipped
target subset; here one voxel-hash grid over the target is built once and
all candidates' transformed clouds query it together.  (The coarse-sphere
pre-clip of the reference is an optimization, not a semantic filter, and is
dropped; distances are exact.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..knn import hashgrid


def overlap_scores(R, t, cand_valid, src_points, src_count,
                   tgt_points, tgt_count, inlier_distance,
                   chunk_candidates: int = 16, window: int = 8):
    """(C,) overlap ratios.

    src_points: (D, 3) BIG-padded downsampled source; tgt_points likewise.
    """
    tmask = jnp.arange(tgt_points.shape[0]) < tgt_count
    grid = hashgrid.build_grid(tgt_points, tmask, inlier_distance)
    smask = jnp.arange(src_points.shape[0]) < src_count
    r2 = jnp.asarray(inlier_distance, jnp.float32) ** 2

    def one(Rt_t):
        Rc, tc, v = Rt_t
        q = src_points @ Rc.T + tc
        d2 = hashgrid.query_min_dist_sq(grid, q, window=window)
        cnt = jnp.sum(((d2 <= r2) & smask).astype(jnp.int32))
        denom = jnp.maximum(jnp.minimum(src_count, tgt_count), 1)
        return jnp.where(v, cnt.astype(jnp.float32) / denom.astype(jnp.float32),
                         0.0)

    C = R.shape[0]
    pad = (-C) % chunk_candidates
    Rp = jnp.concatenate([R, jnp.tile(jnp.eye(3)[None], (pad, 1, 1))]) if pad else R
    tp = jnp.concatenate([t, jnp.zeros((pad, 3))]) if pad else t
    vp = jnp.concatenate([cand_valid, jnp.zeros(pad, bool)]) if pad else cand_valid
    out = jax.lax.map(one, (Rp, tp, vp), batch_size=chunk_candidates)
    return out[:C]
