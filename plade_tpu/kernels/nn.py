"""Pallas TPU kernel: tiled exact nearest-neighbor (min squared distance).

The pipeline's hottest device op is dense 3-D nearest-neighbor: exact
overlap scoring runs it for the top-K candidates over the downsampled
clouds (verify/overlap.py, replacing the reference's per-point KD-tree
radius queries in ComputeOverlap, code/PLADE/util.h:611-647), and ICP runs
it once per iteration (refine/icp.py).

Kernel design (see pallas guide):

* grid (nq, nt) over query-row blocks x reference blocks; the output block
  for a query row is revisited across the nt axis (j fastest), carrying the
  running min/argmin in VMEM — the (Q, T) distance matrix never exists in
  HBM.
* squared distances via three broadcast outer differences on the VPU in
  float32.  Deliberately NOT the |q|^2 - 2qr + |r|^2 MXU expansion: a K=3
  contraction wastes 125/128 of the systolic array, and the cancelled form
  needs full f32 matmul passes anyway to keep spacing-scale distances above
  the noise floor (see package docstring on bf16 truncation).
* argmin resolved per tile (broadcasted_iota + where-reduce), then merged
  into the running pair.

Padding rows (queries or refs at the BIG sentinel) produce huge distances
and never win the min; callers mask on their side.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 1.0e8  # matches knn.bruteforce._blocks padding


def _nn_kernel(q_ref, rx_ref, ry_ref, rz_ref, d_ref, i_ref):
    j = pl.program_id(1)
    qx = q_ref[:, 0:1]                                  # (BQ, 1)
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    dx = qx - rx_ref[:]                                 # (BQ, BT)
    dy = qy - ry_ref[:]
    dz = qz - rz_ref[:]
    d2 = dx * dx + dy * dy + dz * dz
    tile_min = jnp.min(d2, axis=1, keepdims=True)       # (BQ, 1)
    BT = d2.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    tile_arg = jnp.min(jnp.where(d2 <= tile_min, cols, BT),
                       axis=1, keepdims=True) + j * BT  # (BQ, 1)

    @pl.when(j == 0)
    def _():
        d_ref[:] = tile_min
        i_ref[:] = tile_arg

    @pl.when(j != 0)
    def _():
        cur = d_ref[:]
        take = tile_min < cur
        d_ref[:] = jnp.where(take, tile_min, cur)
        i_ref[:] = jnp.where(take, tile_arg, i_ref[:])


@functools.partial(jax.jit, static_argnames=("bq", "bt", "interpret"))
def nearest_neighbor(queries: jnp.ndarray, refs: jnp.ndarray,
                     bq: int = 256, bt: int = 2048,
                     interpret: bool = False):
    """Per-query (min squared distance, argmin index) over ``refs``.

    queries: (Q, 3), refs: (T, 3), float32.  Returns ((Q,) f32, (Q,) i32).
    Indices of padded reference rows never win unless all refs are padding.
    """
    Q = queries.shape[0]
    T = refs.shape[0]
    nq = pl.cdiv(Q, bq)
    nt = pl.cdiv(T, bt)
    qp = jnp.pad(queries, ((0, nq * bq - Q), (0, 0)), constant_values=_PAD)
    rp = jnp.pad(refs, ((0, nt * bt - T), (0, 0)), constant_values=_PAD)
    # split ref coords into three (1, T) rows: the kernel broadcasts each
    # against a (BQ, 1) query column on the VPU
    rx = rp[:, 0].reshape(1, -1)
    ry = rp[:, 1].reshape(1, -1)
    rz = rp[:, 2].reshape(1, -1)

    d, i = pl.pallas_call(
        _nn_kernel,
        grid=(nq, nt),
        in_specs=[
            pl.BlockSpec((bq, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq * bq, 1), jnp.float32),
            jax.ShapeDtypeStruct((nq * bq, 1), jnp.int32),
        ),
        interpret=interpret,
    )(qp, rx, ry, rz)
    return d[:Q, 0], jnp.minimum(i[:Q, 0], T - 1)


def min_dist_sq(queries: jnp.ndarray, refs: jnp.ndarray,
                bq: int = 256, bt: int = 2048,
                interpret: bool = False) -> jnp.ndarray:
    """Per-query squared distance to the nearest reference point."""
    d, _ = nearest_neighbor(queries, refs, bq=bq, bt=bt, interpret=interpret)
    return d


def _oriented_kernel(cos_thresh, q_ref, rx_ref, ry_ref, rz_ref,
                     nx_ref, ny_ref, nz_ref, d_ref):
    j = pl.program_id(1)
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    nx = q_ref[:, 3:4]
    ny = q_ref[:, 4:5]
    nz = q_ref[:, 5:6]
    dx = qx - rx_ref[:]
    dy = qy - ry_ref[:]
    dz = qz - rz_ref[:]
    d2 = dx * dx + dy * dy + dz * dz
    # cos_thresh is a plain python float (a jnp scalar would be captured
    # as a trace-time constant, which pallas_call rejects — see cc.py)
    dot = nx * nx_ref[:] + ny * ny_ref[:] + nz * nz_ref[:]
    d2 = jnp.where(dot >= cos_thresh, d2, jnp.float32(jnp.inf))
    tile_min = jnp.min(d2, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        d_ref[:] = tile_min

    @pl.when(j != 0)
    def _():
        d_ref[:] = jnp.minimum(d_ref[:], tile_min)


@functools.partial(jax.jit,
                   static_argnames=("normal_cos", "bq", "bt", "interpret"))
def oriented_min_dist_sq(queries: jnp.ndarray, qnormals: jnp.ndarray,
                         refs: jnp.ndarray, rnormals: jnp.ndarray,
                         normal_cos: float, bq: int = 256, bt: int = 2048,
                         interpret: bool = False) -> jnp.ndarray:
    """Per-query squared distance to the nearest reference point whose
    normal AGREES (``qn . rn >= normal_cos``) — the oriented-overlap hot
    op (verify/overlap.py).  Same VPU diff-form tiling as the plain
    kernel plus three broadcast multiplies for the normal dot; the jnp
    formulation this replaces paid 6-pass HIGHEST matmuls AND a full
    (Q, T) where/min in HBM (measured the batched tail's largest
    unit-saturating stage).

    queries/qnormals: (Q, 3); refs/rnormals: (T, 3) f32.  Padded ref rows
    (BIG coords) never win; refs with zero normals never pass the gate
    when ``normal_cos > 0``.
    """
    Q = queries.shape[0]
    T = refs.shape[0]
    nq = pl.cdiv(Q, bq)
    nt = pl.cdiv(T, bt)
    q6 = jnp.concatenate([queries, qnormals], axis=1)
    qp = jnp.pad(q6, ((0, nq * bq - Q), (0, 0)), constant_values=_PAD)
    rp = jnp.pad(refs, ((0, nt * bt - T), (0, 0)), constant_values=_PAD)
    np_ = jnp.pad(rnormals, ((0, nt * bt - T), (0, 0)))
    rows = [rp[:, 0], rp[:, 1], rp[:, 2], np_[:, 0], np_[:, 1], np_[:, 2]]
    rows = [r.reshape(1, -1) for r in rows]

    row_spec = pl.BlockSpec((1, bt), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    d = pl.pallas_call(
        functools.partial(_oriented_kernel, float(normal_cos)),
        grid=(nq, nt),
        in_specs=[pl.BlockSpec((bq, 6), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)] + [row_spec] * 6,
        out_specs=pl.BlockSpec((bq, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq * bq, 1), jnp.float32),
        interpret=interpret,
    )(qp, *rows)
    return d[:Q, 0]
