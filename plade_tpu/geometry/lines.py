"""Line geometry: plane-plane intersections, line-line closest points.

Closed-form, batched replacements for the reference's OpenCV solves:

* :func:`intersect_planes` replaces ``ComputeIntersectionLineOfTwoPlanes``
  (code/PLADE/util.cpp:626-676).  The reference picks a 2x2 subsystem by
  largest pivot; any point on the line is equivalent downstream, so we use
  the symmetric closed form ``p = (-d1 (n2 x u) - d2 (u x n1)) / |u|^2``.
* :func:`closest_points_two_lines` replaces the 9x9 ``cv::solve`` of
  ``ComputeNearstTwoPointsOfTwo3DLine`` (util.cpp:1167-1229) with the
  standard two-parameter normal equations.
* :func:`intersect_two_lines` replaces the 6x5 SVD of
  ``ComputeIntersectionPointOf23DLine`` (util.cpp:1461-1500): the
  least-squares "intersection" of two (possibly skew) lines is the midpoint
  of their closest-point segment.

All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp

from .transforms import normalize

_EPS = 1e-12


def intersect_planes(coeffs1: jnp.ndarray, coeffs2: jnp.ndarray,
                     max_cos: float = 0.95):
    """Intersection line of two planes given (nx, ny, nz, d) with n.x+d=0.

    Returns (direction, point, valid) where valid is False for
    near-parallel pairs (|n1.n2| > ``max_cos``; reference constant 0.95,
    util.cpp:634 — overridable via PladeConfig.plane_pair_max_cos).
    """
    n1 = normalize(coeffs1[..., :3])
    n2 = normalize(coeffs2[..., :3])
    d1 = coeffs1[..., 3]
    d2 = coeffs2[..., 3]
    dot = jnp.sum(n1 * n2, axis=-1)
    valid = jnp.abs(dot) <= max_cos
    u = jnp.cross(n1, n2)
    u2 = jnp.maximum(jnp.sum(u * u, axis=-1, keepdims=True), _EPS)
    # p satisfies n1.p = -d1, n2.p = -d2, u.p = 0
    p = (-d1[..., None] * jnp.cross(n2, u) - d2[..., None] * jnp.cross(u, n1)) / u2
    direction = normalize(u)
    return direction, p, valid


def closest_points_two_lines(u1, p1, u2, p2):
    """Closest points between lines (p1 + s u1) and (p2 + t u2).

    Returns (point1, point2, distance).  u1/u2 need not be unit.
    Near-parallel lines fall back to the projection of p2's offset
    (distance is still exact; the witness points are one valid choice).
    """
    u1n = normalize(u1)
    u2n = normalize(u2)
    w0 = p1 - p2
    b = jnp.sum(u1n * u2n, axis=-1)
    d = jnp.sum(u1n * w0, axis=-1)
    e = jnp.sum(u2n * w0, axis=-1)
    denom = 1.0 - b * b
    parallel = denom < 1e-9
    safe = jnp.where(parallel, 1.0, denom)
    s = jnp.where(parallel, 0.0, (b * e - d) / safe)
    t = jnp.where(parallel, -e, (e - b * d) / safe)
    point1 = p1 + s[..., None] * u1n
    point2 = p2 + t[..., None] * u2n
    dist = jnp.linalg.norm(point1 - point2, axis=-1)
    return point1, point2, dist


def intersect_two_lines(u1, p1, u2, p2):
    """Least-squares intersection point of two 3D lines (midpoint of the
    closest-point segment), with validity for near-parallel pairs
    (|u1.u2| > 0.9999, util.cpp:1464)."""
    u1n = normalize(u1)
    u2n = normalize(u2)
    valid = jnp.abs(jnp.sum(u1n * u2n, axis=-1)) <= 0.9999
    q1, q2, _ = closest_points_two_lines(u1n, p1, u2n, p2)
    return 0.5 * (q1 + q2), valid


def point_line_distance(point, u, p):
    """Distance from point(s) to the line (p + t u). Broadcasts."""
    un = normalize(u)
    w = point - p
    along = jnp.sum(w * un, axis=-1, keepdims=True) * un
    return jnp.linalg.norm(w - along, axis=-1)


def point_segment_distance(point, a, b):
    """Distance from point(s) to segment [a, b]. Broadcasts."""
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1, keepdims=True), _EPS)
    t = jnp.clip(jnp.sum((point - a) * ab, axis=-1, keepdims=True) / denom, 0.0, 1.0)
    proj = a + t * ab
    return jnp.linalg.norm(point - proj, axis=-1)


def project_points_to_plane(points, coeffs):
    """Orthogonal projection of points onto plane (n, d) with n.x+d=0.

    Mirrors ``ProjectPoints2Plane`` (util.h:292-329).  Broadcasts.
    """
    n = coeffs[..., :3]
    d = coeffs[..., 3]
    n2 = jnp.maximum(jnp.sum(n * n, axis=-1), _EPS)
    k = -(jnp.sum(points * n, axis=-1) + d) / n2
    return points + k[..., None] * n
