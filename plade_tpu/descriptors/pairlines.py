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


def degraded_descriptors(lines: LineSet, plane_normals: jnp.ndarray, scale,
                         max_pairs: int, ordered: bool,
                         min_angle_cos: float, family: str,
                         pad_value: float = 1.0e6) -> PairDescriptors:
    """Degraded 6-D descriptor families 22-21 / 22-12 (feature-flagged).

    The reference builds these on the target side for every 2-2 pair —
    one of a line's two support planes is replaced by the pseudo-plane
    ``lineVec x (+-plane)`` and the 6-D method21/method12 layout is
    emitted (util.cpp:830-919; layouts util.cpp:578-593) — but its
    querying side only probes them from boundary-line pairs, which are
    dead code (plade.cpp:176,384), so no 6-D match ever happens in the
    live reference.  This framework's flag connects the two halves: 2-2
    SOURCE pairs emit the degraded variants as QUERIES, so a line pair
    whose plane correspondence is broken in one cloud (a support plane
    unextracted — the plane-poor case the families exist for) can still
    match the other cloud's intact 2-2 geometry.

    ``family``: "2221" degrades line2 (method21: [dist/scale, n1.n2,
    sp11.sp12, n1.real2, n2.sp11, n2.sp12]); "2212" degrades line1
    (method12: [dist/scale, n1.n2, sp21.sp22, n1.sp21, n1.sp22,
    n2.real1]).  Target side (ordered=True) emits 4 variants per pair
    (either surviving plane x the +- pseudo sign, matching the
    reference's 4 add_point calls); the query side emits 2 (the +- target
    variants already cover the sign ambiguity).

    Returns PairDescriptors with (max_pairs * variants) rows.
    """
    assert family in ("2221", "2212")
    L = lines.direction.shape[0]
    u = lines.direction
    p = lines.point
    sp = plane_normals[lines.support]                  # (L, 2, 3)

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

    q1, _, dist = closest_points_two_lines(u[ii], p[ii], u[jj], p[jj])
    u1, u2 = u[ii], u[jj]

    def dot(a, b):
        return jnp.sum(a * b, -1)

    # variants: (surviving plane k, pseudo sign s); target = 4, query = 2
    variants = [(0, 1.0), (1, 1.0), (0, -1.0), (1, -1.0)] if ordered \
        else [(0, 1.0), (1, 1.0)]
    rows = []
    for k, s in variants:
        if family == "2221":
            real = sp[jj, k]                               # line2 survivor
            pseudo = jnp.cross(u2, s * real)
            sp11, sp12 = _canonical(u2, sp[ii, 0], sp[ii, 1])
            n21, n22 = _canonical(u1, real, pseudo)
            new1 = jnp.cross(sp11, sp12)
            new2 = jnp.cross(n21, n22)
            desc = jnp.stack([
                dist / scale, dot(new1, new2), dot(sp11, sp12),
                dot(new1, real), dot(new2, sp11), dot(new2, sp12),
            ], axis=-1)
        else:
            real = sp[ii, k]                               # line1 survivor
            pseudo = jnp.cross(u1, s * real)
            n11, n12 = _canonical(u2, real, pseudo)
            sp21, sp22 = _canonical(u1, sp[jj, 0], sp[jj, 1])
            new1 = jnp.cross(n11, n12)
            new2 = jnp.cross(sp21, sp22)
            desc = jnp.stack([
                dist / scale, dot(new1, new2), dot(sp21, sp22),
                dot(new1, sp21), dot(new1, sp22), dot(new2, real),
            ], axis=-1)
        rows.append((desc, new1, new2))

    desc = jnp.concatenate([r[0] for r in rows], axis=0)
    new1 = jnp.concatenate([r[1] for r in rows], axis=0)
    new2 = jnp.concatenate([r[2] for r in rows], axis=0)
    V = len(variants)
    in_r = jnp.tile(in_range, V)
    q1v = jnp.tile(q1, (V, 1))
    iiv = jnp.tile(ii, V)
    jjv = jnp.tile(jj, V)
    desc = jnp.where(in_r[:, None], desc, pad_value)
    zero3 = jnp.zeros_like(new1)
    return PairDescriptors(
        desc=desc,
        line_vec1=jnp.where(in_r[:, None], new1, zero3),
        line_vec2=jnp.where(in_r[:, None], new2, zero3),
        anchor=jnp.where(in_r[:, None], q1v, zero3),
        line_idx=jnp.where(in_r[:, None],
                           jnp.stack([iiv, jjv], axis=-1),
                           0).astype(jnp.int32),
        count=(jnp.minimum(count, max_pairs) * V).astype(jnp.int32),
    )
