"""Voxel-hash neighbor grid: KD-tree-free fixed-radius queries.

Replaces ``pcl::search::KdTree`` radius queries in the per-candidate overlap
scoring loop (reference ComputeOverlap, code/PLADE/util.h:611-647, called
from plade.cpp:545-575 — the hot final loop).  A pointer-chasing KD-tree is
hostile to TPUs; instead points are bucketed by a hashed voxel cell id and
sorted, and a query inspects the 27 neighboring cells with a fixed-size
window per bucket — pure gathers + vectorized compare, no data-dependent
shapes.

Hash collisions only ever *add* candidate points (filtered by the true
distance test), never lose them; a full bucket window (> window points in
one bucket) can drop neighbors, so ``window`` is sized for the downsampled
clouds this is used on (leaf size == query radius -> few points per cell).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_P1, _P2, _P3 = 73856093, 19349663, 83492791  # classic spatial-hash primes


class HashGrid(NamedTuple):
    points: jnp.ndarray        # (N, 3) sorted by bucket
    bucket_ids: jnp.ndarray    # (N,) int32 sorted
    origin: jnp.ndarray        # (3,)
    cell: jnp.ndarray          # () float32
    table_size: int            # static


def _cell_coords(points, origin, cell):
    # clip before casting: BIG-padded sentinel points would overflow int32
    rel = jnp.clip((points - origin) / cell, -1.0, 2.0**20)
    return jnp.floor(rel).astype(jnp.int32)


def _bucket(q: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Hash integer cell coords (..., 3) -> bucket id in [0, table_size)."""
    h = (q[..., 0] * _P1) ^ (q[..., 1] * _P2) ^ (q[..., 2] * _P3)
    return jnp.abs(h) % table_size


def build_grid(points: jnp.ndarray, mask: jnp.ndarray, cell,
               table_size: int = 32768) -> HashGrid:
    """Build a grid over the masked points (BIG-padded rows excluded by
    their own coordinates; they land in overflow buckets that true-distance
    tests reject)."""
    big = jnp.float32(1e30)
    origin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    cell = jnp.asarray(cell, jnp.float32)
    q = _cell_coords(points, origin, cell)
    b = jnp.where(mask, _bucket(q, table_size), table_size)  # invalid last
    order = jnp.argsort(b)
    return HashGrid(points=points[order], bucket_ids=b[order].astype(jnp.int32),
                    origin=origin, cell=cell, table_size=table_size)


_OFFSETS = jnp.array(
    [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    dtype=jnp.int32)  # (27, 3)


def query_min_dist_sq(grid: HashGrid, queries: jnp.ndarray,
                      window: int = 8) -> jnp.ndarray:
    """Per-query squared distance to the nearest grid point found in the
    27-cell neighborhood (exact for neighbors within one cell size;
    +inf if none found in the window)."""
    qcell = _cell_coords(queries, grid.origin, grid.cell)
    ncells = qcell[:, None, :] + _OFFSETS[None, :, :]          # (Q, 27, 3)
    buckets = _bucket(ncells, grid.table_size)                 # (Q, 27)
    starts = jnp.searchsorted(grid.bucket_ids, buckets.reshape(-1),
                              side="left").reshape(buckets.shape)
    n = grid.points.shape[0]
    best = jnp.full(queries.shape[0], jnp.inf, jnp.float32)
    for w in range(window):
        idx = jnp.minimum(starts + w, n - 1)                   # (Q, 27)
        hit = grid.bucket_ids[idx] == buckets                  # same bucket
        cand = grid.points[idx]                                # (Q, 27, 3)
        d = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
        d = jnp.where(hit, d, jnp.inf)
        best = jnp.minimum(best, jnp.min(d, axis=1))
    return best


def query_count_within(grid: HashGrid, queries: jnp.ndarray, radius,
                       window: int = 8) -> jnp.ndarray:
    """Per-query count of grid points within ``radius`` (radius must be
    <= cell size for exactness)."""
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    qcell = _cell_coords(queries, grid.origin, grid.cell)
    ncells = qcell[:, None, :] + _OFFSETS[None, :, :]
    buckets = _bucket(ncells, grid.table_size)
    starts = jnp.searchsorted(grid.bucket_ids, buckets.reshape(-1),
                              side="left").reshape(buckets.shape)
    n = grid.points.shape[0]
    count = jnp.zeros(queries.shape[0], jnp.int32)
    for w in range(window):
        idx = jnp.minimum(starts + w, n - 1)
        hit = grid.bucket_ids[idx] == buckets
        cand = grid.points[idx]
        d = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
        count = count + jnp.sum((hit & (d <= r2)).astype(jnp.int32), axis=1)
    return count
