"""Batched line-to-line distances — all 17 types of the reference.

Re-implements the distance zoo of
/root/reference/src/limap/base/line_dists.h:13-31 (enum ``LineDistType``)
as vectorized JAX functions.  Every function takes two :class:`Segments`
whose fields broadcast against each other, so the same code computes a
single distance, an aligned batch ``[N]``, or a full pairwise matrix
``[N, M]`` (via :func:`pairwise`).

Where the reference returns ``double::max`` for undefined cases
(e.g. non-overlapping inner segments), we return ``MAX_DIST``.
"""

from __future__ import annotations

import jax.numpy as jnp

from limap_tpu.base.lines import EPS, Segments

MAX_DIST = 1e12

DIST_TYPES = (
    "angular", "angular_dist", "endpoints", "midpoint",
    "midpoint_perpendicular", "overlap", "bioverlap", "overlap_dist",
    "perpendicular_oneway", "perpendicular",
    "perpendicular_scaleinv_line3dpp_oneway",
    "perpendicular_scaleinv_line3dpp",
    "perpendicular_scaleinv_oneway", "perpendicular_scaleinv",
    "endpoints_scaleinv_oneway", "endpoints_scaleinv", "innerseg",
)


# ---------------------------------------------------------------- basics
def cosine(l1: Segments, l2: Segments) -> jnp.ndarray:
    """|d1 . d2| (line_dists.h:52-55)."""
    return jnp.abs(jnp.sum(l1.direction() * l2.direction(), axis=-1))


def angle(l1: Segments, l2: Segments) -> jnp.ndarray:
    """Angle between directions in degrees (line_dists.h:62-66)."""
    c = jnp.clip(cosine(l1, l2), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(c))


def dist_angular(l1: Segments, l2: Segments) -> jnp.ndarray:
    return 1.0 - cosine(l1, l2)


def dist_midpoint(l1: Segments, l2: Segments) -> jnp.ndarray:
    return jnp.linalg.norm(l1.midpoint() - l2.midpoint(), axis=-1)


def dist_endpoints(l1: Segments, l2: Segments) -> jnp.ndarray:
    """min over the two endpoint pairings (line_dists.h:73-78)."""
    d1 = (jnp.linalg.norm(l1.start - l2.start, axis=-1)
          + jnp.linalg.norm(l1.end - l2.end, axis=-1))
    d2 = (jnp.linalg.norm(l1.start - l2.end, axis=-1)
          + jnp.linalg.norm(l1.end - l2.start, axis=-1))
    return jnp.minimum(d1, d2)


def _perp_dist_point_to_infline(p, origin, direction):
    """Distance from p to the infinite line (origin, unit direction)."""
    disp = p - origin
    along = jnp.sum(disp * direction, axis=-1)
    d2 = jnp.sum(disp * disp, axis=-1) - along * along
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def dist_midpoint_perpendicular(l1: Segments, l2: Segments) -> jnp.ndarray:
    """0.5*(d(mid1, line2) + d(mid2, line1)) (line_dists.h:80-96)."""
    d12 = _perp_dist_point_to_infline(l1.midpoint(), l2.start, l2.direction())
    d21 = _perp_dist_point_to_infline(l2.midpoint(), l1.start, l1.direction())
    return 0.5 * (d12 + d21)


def dists_endpoints_perpendicular_oneway(l1: Segments, l2: Segments):
    """Perp distances of l1's endpoints to l2's infinite line
    (line_dists.h:98-111). Returns (d_start, d_end)."""
    v2 = l2.direction()
    ds = _perp_dist_point_to_infline(l1.start, l2.start, v2)
    de = _perp_dist_point_to_infline(l1.end, l2.start, v2)
    return ds, de


def dist_endpoints_perpendicular_oneway(l1, l2) -> jnp.ndarray:
    ds, de = dists_endpoints_perpendicular_oneway(l1, l2)
    return jnp.maximum(ds, de)


def dist_endpoints_perpendicular(l1, l2) -> jnp.ndarray:
    """max over the four endpoint-to-line distances (line_dists.h:121-133)."""
    return jnp.maximum(dist_endpoints_perpendicular_oneway(l1, l2),
                       dist_endpoints_perpendicular_oneway(l2, l1))


# ------------------------------------------------------- scale-invariant
def dist_endpoints_perpendicular_scaleinv_line3dpp_oneway(l1, l2):
    """Line3D++-style scale-invariant perp distance (line_dists.cc:9-17).

    Requires ``l1.depths``.
    """
    ds, de = dists_endpoints_perpendicular_oneway(l1, l2)
    return jnp.maximum(ds / (l1.depths[..., 0] + EPS),
                       de / (l1.depths[..., 1] + EPS))


def dist_endpoints_perpendicular_scaleinv_line3dpp(l1, l2):
    return jnp.maximum(
        dist_endpoints_perpendicular_scaleinv_line3dpp_oneway(l1, l2),
        dist_endpoints_perpendicular_scaleinv_line3dpp_oneway(l2, l1))


def dist_endpoints_perpendicular_scaleinv_oneway(l1, l2):
    """Scale-invariant perp distance w/ interpolated depth on l2
    (line_dists.cc:26-46)."""
    ds, de = dists_endpoints_perpendicular_oneway(l1, l2)
    dir2 = l2.direction()
    len2 = l2.length()
    a_s = jnp.sum((l1.start - l2.start) * dir2, axis=-1) / (len2 + EPS)
    a_e = jnp.sum((l1.end - l2.start) * dir2, axis=-1) / (len2 + EPS)
    z0, z1 = l2.depths[..., 0], l2.depths[..., 1]
    depth_s = z0 + a_s * (z1 - z0)
    depth_e = z0 + a_e * (z1 - z0)
    val = jnp.maximum(ds / depth_s, de / depth_e)
    bad = (a_s < 100 * EPS) | (a_e < 100 * EPS)
    return jnp.where(bad, MAX_DIST, val)


def dist_endpoints_perpendicular_scaleinv(l1, l2):
    return jnp.maximum(dist_endpoints_perpendicular_scaleinv_oneway(l1, l2),
                       dist_endpoints_perpendicular_scaleinv_oneway(l2, l1))


def dist_endpoints_scaleinv_oneway(l1, l2):
    """Aligned endpoint distance over l1's depths (line_dists.cc:55-60)."""
    ds = jnp.linalg.norm(l1.start - l2.start, axis=-1)
    de = jnp.linalg.norm(l1.end - l2.end, axis=-1)
    return jnp.maximum(ds / (l1.depths[..., 0] + EPS),
                       de / (l1.depths[..., 1] + EPS))


def dist_endpoints_scaleinv(l1, l2):
    return jnp.maximum(dist_endpoints_scaleinv_oneway(l1, l2),
                       dist_endpoints_scaleinv_oneway(l2, l1))


# ------------------------------------------------------------- overlaps
def compute_overlap(l1: Segments, l2: Segments) -> jnp.ndarray:
    """Signed intersection ratio of l1 projected onto l2
    (line_dists.h:189-200)."""
    length = l2.length()
    v = l2.direction()
    p1 = jnp.sum((l1.start - l2.start) * v, axis=-1) / (length + EPS)
    p2 = jnp.sum((l1.end - l2.start) * v, axis=-1) / (length + EPS)
    lo = jnp.minimum(p1, p2)
    hi = jnp.maximum(p1, p2)
    return jnp.minimum(hi, 1.0) - jnp.maximum(lo, 0.0)


def compute_bioverlap(l1, l2) -> jnp.ndarray:
    return jnp.maximum(compute_overlap(l1, l2), compute_overlap(l2, l1))


def dist_overlap(l1, l2) -> jnp.ndarray:
    return 1.0 - compute_bioverlap(l1, l2)


# -------------------------------------------------------------- innerseg
def _innerseg(l1: Segments, l2: Segments):
    """Unproject l1's endpoints onto l2 along l1's direction and clip to
    the overlapping sub-segment of l2 (line_dists.h:159-176).

    Returns (start, end, valid) of the inner segment on l2.
    """
    v1 = l1.direction()
    seg2 = l2.end - l2.start
    denom = jnp.sum(seg2 * v1, axis=-1)
    t1 = jnp.sum((l1.start - l2.start) * v1, axis=-1) / (denom + EPS)
    t2 = jnp.sum((l1.end - l2.start) * v1, axis=-1) / (denom + EPS)
    tlo = jnp.minimum(t1, t2)
    thi = jnp.maximum(t1, t2)
    valid = (tlo < 1.0) & (thi > 0.0)
    start = l2.start + seg2 * jnp.maximum(tlo, 0.0)[..., None]
    end = l2.start + seg2 * jnp.minimum(thi, 1.0)[..., None]
    return start, end, valid


def dist_innerseg(l1: Segments, l2: Segments) -> jnp.ndarray:
    """Mutual inner-segment perpendicular distance (line_dists.h:178-187).

    MAX_DIST when the unprojections do not overlap.
    """
    s1, e1, ok1 = _innerseg(l2, l1)  # inner seg on l1
    s2, e2, ok2 = _innerseg(l1, l2)  # inner seg on l2
    inner1 = Segments(s1, e1)
    inner2 = Segments(s2, e2)
    d = dist_endpoints_perpendicular(inner1, inner2)
    return jnp.where(ok1 & ok2, d, MAX_DIST)


# ------------------------------------------------- infinite-line variants
def infinite_dist_perpendicular(l1: Segments, l2: Segments) -> jnp.ndarray:
    """Min distance between the two infinite 3D lines (line_dists.cc:68-94)."""
    C0 = l1.start - l2.start
    Cp = l1.end - l1.start
    Cq = l2.start - l2.end
    A11 = jnp.sum(Cp * Cp, axis=-1)
    A22 = jnp.sum(Cq * Cq, axis=-1)
    A12 = jnp.sum(Cp * Cq, axis=-1)
    B1 = -jnp.sum(C0 * Cp, axis=-1)
    B2 = -jnp.sum(C0 * Cq, axis=-1)
    det = A11 * A22 - A12 * A12
    p_par = B1 / (A11 + EPS)
    q_par = jnp.zeros_like(p_par)
    p_gen = (B1 * A22 - B2 * A12) / jnp.where(det < EPS, 1.0, det)
    q_gen = (A11 * B2 - A12 * B1) / jnp.where(det < EPS, 1.0, det)
    nearly_par = det < EPS
    p = jnp.where(nearly_par, p_par, p_gen)
    q = jnp.where(nearly_par, q_par, q_gen)
    return jnp.linalg.norm(C0 + Cp * p[..., None] + Cq * q[..., None], axis=-1)


def infinite_perpendicular_scaleinv_line3dpp(l1, l2) -> jnp.ndarray:
    """Scale-invariant infinite perp distance, one way
    (line_dists.cc:96-124). Requires l1.depths."""
    z1 = l1.depths[..., 0]
    z2 = l1.depths[..., 1]
    vec2 = l2.end - l2.start
    v = vec2 / (jnp.linalg.norm(vec2, axis=-1, keepdims=True) + EPS)
    dz = (z2 - z1)[..., None]
    Ck = l1.start - (l1.end - l1.start) * (z1[..., None] / (dz + EPS)) - l2.start
    Cz = (l1.end - l1.start) / (dz + EPS)
    CkTv = jnp.sum(Ck * v, axis=-1)
    A = jnp.sum(Ck * Ck, axis=-1) - CkTv**2
    B = jnp.sum(Ck * Cz, axis=-1) - CkTv * jnp.sum(Cz * v, axis=-1)
    k = -B / (A + EPS)
    w = Ck * k[..., None] + Cz
    d2 = jnp.sum(w * w, axis=-1) - jnp.sum(w * v, axis=-1) ** 2
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def infinite_dist_perpendicular_scaleinv_line3dpp(l1, l2) -> jnp.ndarray:
    return jnp.minimum(infinite_perpendicular_scaleinv_line3dpp(l1, l2),
                       infinite_perpendicular_scaleinv_line3dpp(l2, l1))


def dist_minpoint_oneway(l1: Segments, l2: Segments) -> jnp.ndarray:
    """Min distance from a point on segment l1 to infinite line l2
    (line_dists.cc:134-171); works for 2D and 3D."""
    v1 = l1.direction()
    v2 = l2.direction()
    disp = l2.start - l1.start
    start_vec = disp - jnp.sum(disp * v2, axis=-1, keepdims=True) * v2
    val = jnp.linalg.norm(start_vec, axis=-1)
    sv_unit = start_vec / (val[..., None] + EPS)
    beta1 = jnp.sum(v1 * sv_unit, axis=-1)
    if l1.dim == 2:
        moved = jnp.maximum(0.0, val - beta1 * l1.length())
        res = jnp.where(beta1 <= 0, val, moved)
    else:
        beta2 = jnp.sum(v1 * v2, axis=-1)
        beta3 = jnp.sqrt(jnp.maximum(1.0 - beta1**2 - beta2**2, 0.0))
        denom = beta1**2 + beta3**2
        peak = (beta1 * val) / (denom + EPS)
        x = jnp.minimum(peak, l1.length())
        res_in = jnp.sqrt((val - beta1 * x) ** 2 + (beta3 * x) ** 2)
        res = jnp.where(beta1 <= 0, val, res_in)
    return jnp.where(val < EPS, 0.0, res)


def dist_minpoint(l1, l2) -> jnp.ndarray:
    return jnp.minimum(dist_minpoint_oneway(l1, l2),
                       dist_minpoint_oneway(l2, l1))


# ------------------------------------------------------------ dispatcher
_DISPATCH = {
    "angular": angle,
    "angular_dist": dist_angular,
    "endpoints": dist_endpoints,
    "midpoint": dist_midpoint,
    "midpoint_perpendicular": dist_midpoint_perpendicular,
    "overlap": compute_overlap,
    "bioverlap": compute_bioverlap,
    "overlap_dist": dist_overlap,
    "perpendicular_oneway": dist_endpoints_perpendicular_oneway,
    "perpendicular": dist_endpoints_perpendicular,
    "innerseg": dist_innerseg,
    "perpendicular_scaleinv_line3dpp_oneway":
        dist_endpoints_perpendicular_scaleinv_line3dpp_oneway,
    "perpendicular_scaleinv_line3dpp":
        dist_endpoints_perpendicular_scaleinv_line3dpp,
    "perpendicular_scaleinv_oneway":
        dist_endpoints_perpendicular_scaleinv_oneway,
    "perpendicular_scaleinv": dist_endpoints_perpendicular_scaleinv,
    "endpoints_scaleinv_oneway": dist_endpoints_scaleinv_oneway,
    "endpoints_scaleinv": dist_endpoints_scaleinv,
}

_3D_ONLY = frozenset(k for k in _DISPATCH if "scaleinv" in k)


def compute_distance(l1: Segments, l2: Segments, dist_type: str):
    """Dispatch equivalent of the reference's compute_distance
    (line_dists.cc:183-269)."""
    if dist_type not in _DISPATCH:
        raise ValueError(f"unknown distance type {dist_type!r}")
    if dist_type in _3D_ONLY and l1.dim == 2:
        raise ValueError(f"{dist_type} is not supported for 2D lines")
    return _DISPATCH[dist_type](l1, l2)


def _expand(segs: Segments, axis: int) -> Segments:
    f = lambda x: None if x is None else jnp.expand_dims(x, axis)
    return Segments(f(segs.start), f(segs.end), f(segs.score),
                    f(segs.depths), f(segs.uncertainty))


def pairwise(l1: Segments, l2: Segments, dist_type: str) -> jnp.ndarray:
    """All-pairs distance matrix [N, M] between two segment batches.

    Replaces compute_pairwise_distance (line_dists.h:37-50) — computed in
    one vectorized broadcast instead of a double loop.
    """
    return compute_distance(_expand(l1, 1), _expand(l2, 0), dist_type)
