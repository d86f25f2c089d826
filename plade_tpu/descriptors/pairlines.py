"""Pair-line 8-D descriptor construction, fully vectorized.

Replaces the reference's per-pair loops in ``ConstructPairLinesKdTree``
(code/PLADE/util.cpp:706-1165, target side) and the query-descriptor loop in
``MatchingLines`` (util.cpp:133-293, source side).  The live reference path
is pure 2-2 matching — every line is a two-plane intersection line and only
the 8-D ``method22`` family is ever populated *and* queried (boundary lines
are dead code; SURVEY 2.1.4j) — so this module implements exactly that
family, for all line pairs at once.

Descriptor layout (ComputeDescriptorVectorForPairLines, util.cpp:533-602):

  [0] closest-distance between the two lines / scale
  [1] newLine1 . newLine2
  [2] sp11 . sp12          (support-plane normals of line 1, canonical order)
  [3] sp21 . sp22
  [4] newLine1 . sp21   [5] newLine1 . sp22
  [6] newLine2 . sp11   [7] newLine2 . sp12

where the support planes of the *other* line are ordered so that the one
more parallel to this line's direction comes second (|u . sp| ordering,
util.cpp:543-566), and newLineX = spX1 x spX2 (unnormalized, as in the
reference — its magnitude sin(angle) is part of the descriptor).

Shape strategy: the O(L^2) pair mask is computed densely (bools only), the
surviving pair indices are compacted to a static budget, and the actual
descriptor math runs on compacted pairs — never on the full L^2 grid.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import LineSet, PairDescriptors
from ..geometry.lines import closest_points_two_lines


def _canonical(u_self, sp_a, sp_b):
    """Order (sp_a, sp_b) so |u_self . first| <= |u_self . second|."""
    swap = jnp.abs(jnp.sum(u_self * sp_a, -1)) > jnp.abs(jnp.sum(u_self * sp_b, -1))
    first = jnp.where(swap[..., None], sp_b, sp_a)
    second = jnp.where(swap[..., None], sp_a, sp_b)
    return first, second


def pair_descriptors(lines: LineSet, plane_normals: jnp.ndarray, scale,
                     max_pairs: int, ordered: bool,
                     min_angle_cos: float,
                     pad_value: float = 1.0e6) -> PairDescriptors:
    """Descriptors for all retained line pairs.

    ordered=True builds both (i, j) and (j, i) rows — the target side
    (util.cpp:778 loops all ordered pairs); ordered=False builds i<j only —
    the query side (plade.cpp:514-521).  Pairs with
    |u_i . u_j| > cos(10 deg) are dropped on both sides
    (util.cpp:799 / plade.cpp:516).
    """
    L = lines.direction.shape[0]
    u = lines.direction
    p = lines.point
    sp = plane_normals[lines.support]                  # (L, 2, 3)

    # --- dense boolean pair mask (L x L), then compact ---
    lmask = lines.mask
    cosang = jnp.abs(u @ u.T)
    keep = lmask[:, None] & lmask[None, :]
    tri = jnp.arange(L)[None, :] > jnp.arange(L)[:, None]
    keep &= tri if not ordered else ~jnp.eye(L, dtype=bool)
    keep &= cosang <= min_angle_cos

    idx = jnp.nonzero(keep.reshape(-1), size=max_pairs, fill_value=L * L)[0]
    in_range = idx < L * L
    idx_safe = jnp.minimum(idx, L * L - 1)
    ii = idx_safe // L
    jj = idx_safe % L
    count = jnp.sum(keep.astype(jnp.int32))

    # --- descriptor math on compacted pairs only ---
    q1, _, dist = closest_points_two_lines(u[ii], p[ii], u[jj], p[jj])
    u1, u2 = u[ii], u[jj]
    sp11, sp12 = _canonical(u2, sp[ii, 0], sp[ii, 1])
    sp21, sp22 = _canonical(u1, sp[jj, 0], sp[jj, 1])
    new1 = jnp.cross(sp11, sp12)
    new2 = jnp.cross(sp21, sp22)

    def dot(a, b):
        return jnp.sum(a * b, -1)

    desc = jnp.stack([
        dist / scale,
        dot(new1, new2),
        dot(sp11, sp12),
        dot(sp21, sp22),
        dot(new1, sp21),
        dot(new1, sp22),
        dot(new2, sp11),
        dot(new2, sp12),
    ], axis=-1)

    # padded descriptor rows are pushed far away so they can never fall
    # inside the 0.04 match radius (use opposite pad_value signs for the
    # query and target sides so pads cannot match each other either)
    desc = jnp.where(in_range[:, None], desc, pad_value)
    zero3 = jnp.zeros_like(new1)
    return PairDescriptors(
        desc=desc,
        line_vec1=jnp.where(in_range[:, None], new1, zero3),
        line_vec2=jnp.where(in_range[:, None], new2, zero3),
        anchor=jnp.where(in_range[:, None], q1, zero3),
        line_idx=jnp.where(in_range[:, None],
                           jnp.stack([ii, jj], axis=-1), 0).astype(jnp.int32),
        count=jnp.minimum(count, max_pairs).astype(jnp.int32),
    )
