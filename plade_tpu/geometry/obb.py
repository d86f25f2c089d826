"""PCA-oriented bounding boxes over masked point sets.

Replaces ``ComputeBoundingBox`` (code/PLADE/util.h:186-248): centroid +
normalized covariance + eigenvectors, extents in the eigenframe, and the
8 corner points (the first four of which form the quad used for plane
clipping downstream, util.h:226-233 ordering preserved).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_EPS = 1e-12


class OBB(NamedTuple):
    center: jnp.ndarray   # (..., 3) world-space box center
    axes: jnp.ndarray     # (..., 3, 3) columns = eigenvectors (ascending)
    extents: jnp.ndarray  # (..., 3) width (x), depth (y), height (z)
    corners: jnp.ndarray  # (..., 8, 3) world-space corners, reference order
    radius: jnp.ndarray   # (...,) = max extent / 2 (plade.cpp:84)


def masked_mean(points, mask):
    w = mask.astype(points.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    return jnp.sum(points * w[..., None], axis=-2) / n


def compute_obb(points: jnp.ndarray, mask: jnp.ndarray) -> OBB:
    """PCA OBB of the masked points. Batched over leading dims."""
    centroid = masked_mean(points, mask)
    w = mask.astype(points.dtype)
    c = (points - centroid[..., None, :]) * w[..., None]
    n = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    cov = jnp.einsum("...ni,...nj->...ij", c, c) / n[..., None, None]
    # ascending eigenvalues, like Eigen's; closed-form 3x3 (geometry/eig3)
    # instead of the iterative lax.linalg.eigh
    from .eig3 import sym_eigh3
    _, vecs = sym_eigh3(cov)
    # force right-handed frame: col2 = col0 x col1 (util.h:201)
    e0 = vecs[..., :, 0]
    e1 = vecs[..., :, 1]
    e2 = jnp.cross(e0, e1)
    axes = jnp.stack([e0, e1, e2], axis=-1)
    # coordinates in the eigenframe
    local = jnp.einsum("...ij,...nj->...ni", jnp.swapaxes(axes, -1, -2),
                       points - centroid[..., None, :])
    big = jnp.float32(1e30)
    lmin = jnp.min(jnp.where(mask[..., None], local, big), axis=-2)
    lmax = jnp.max(jnp.where(mask[..., None], local, -big), axis=-2)
    extents = lmax - lmin
    mean_diag = 0.5 * (lmin + lmax)
    center = jnp.einsum("...ij,...j->...i", axes, mean_diag) + centroid
    x, y, z = lmin[..., 0], lmin[..., 1], lmin[..., 2]
    wd, dp, ht = extents[..., 0], extents[..., 1], extents[..., 2]
    # corner order copied from the reference (util.h:226-233); the first four
    # corners trace the min-x face as a closed quad.
    corners_local = jnp.stack([
        jnp.stack([x, y, z], -1),
        jnp.stack([x, y + dp, z], -1),
        jnp.stack([x, y + dp, z + ht], -1),
        jnp.stack([x, y, z + ht], -1),
        jnp.stack([x + wd, y, z + ht], -1),
        jnp.stack([x + wd, y + dp, z], -1),
        jnp.stack([x + wd, y, z], -1),
        jnp.stack([x + wd, y + dp, z + ht], -1),
    ], axis=-2)
    corners = jnp.einsum("...ij,...nj->...ni", axes, corners_local) + centroid[..., None, :]
    radius = jnp.max(extents, axis=-1) / 2.0
    return OBB(center=center, axes=axes, extents=extents, corners=corners,
               radius=radius)
