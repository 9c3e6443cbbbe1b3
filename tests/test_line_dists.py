"""Numeric tests of the 17 line distances against independent NumPy ports
of the cited C++ formulas (SURVEY.md §7 test strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from limap_tpu.base import line_dists as ld
from limap_tpu.base.lines import Segments


def np_seg(start, end, depths=None):
    return Segments(jnp.asarray(start, jnp.float32),
                    jnp.asarray(end, jnp.float32),
                    depths=None if depths is None
                    else jnp.asarray(depths, jnp.float32))


def rand_segs(rng, n, d, with_depths=False):
    start = rng.normal(size=(n, d)) * 5
    end = start + rng.normal(size=(n, d)) * 3 + 0.5
    depths = 1.0 + rng.uniform(size=(n, 2)) * 4 if with_depths else None
    return np_seg(start, end, depths), (start, end, depths)


# ---- scalar NumPy references (independent ports of line_dists.h) ----
def ref_perp_oneway(s1, e1, s2, e2):
    v2 = (e2 - s2) / np.linalg.norm(e2 - s2)
    def perp(p):
        disp = p - s2
        return np.sqrt(max(disp @ disp - (disp @ v2) ** 2, 0.0))
    return max(perp(s1), perp(e1))


def ref_overlap(s1, e1, s2, e2):
    ln = np.linalg.norm(e2 - s2)
    v = (e2 - s2) / ln
    p1 = (s1 - s2) @ v / ln
    p2 = (e1 - s2) @ v / ln
    p1, p2 = min(p1, p2), max(p1, p2)
    return min(p2, 1.0) - max(p1, 0.0)


def ref_innerseg(s1, e1, s2, e2):
    def get_inner(sa, ea, sb, eb):
        va = (ea - sa) / np.linalg.norm(ea - sa)
        denom = (eb - sb) @ va
        t1 = (sa - sb) @ va / (denom + 1e-12)
        t2 = (ea - sb) @ va / (denom + 1e-12)
        if t1 > t2:
            t1, t2 = t2, t1
        if t1 >= 1.0 or t2 <= 0.0:
            return None
        return (sb + (eb - sb) * max(t1, 0.0), sb + (eb - sb) * min(t2, 1.0))
    i1 = get_inner(s2, e2, s1, e1)
    i2 = get_inner(s1, e1, s2, e2)
    if i1 is None or i2 is None:
        return ld.MAX_DIST
    return max(ref_perp_oneway(*i1, *i2), ref_perp_oneway(*i2, *i1))


def test_angular_and_endpoints(rng):
    l1, (s1, e1, _) = rand_segs(rng, 32, 3)
    l2, (s2, e2, _) = rand_segs(rng, 32, 3)
    ang = np.asarray(ld.angle(l1, l2))
    for i in range(32):
        v1 = (e1[i] - s1[i]) / np.linalg.norm(e1[i] - s1[i])
        v2 = (e2[i] - s2[i]) / np.linalg.norm(e2[i] - s2[i])
        ref = np.degrees(np.arccos(min(abs(v1 @ v2), 1.0)))
        assert abs(ang[i] - ref) < 1e-2
    de = np.asarray(ld.dist_endpoints(l1, l2))
    for i in range(32):
        d1 = np.linalg.norm(s1[i] - s2[i]) + np.linalg.norm(e1[i] - e2[i])
        d2 = np.linalg.norm(s1[i] - e2[i]) + np.linalg.norm(e1[i] - s2[i])
        assert abs(de[i] - min(d1, d2)) < 1e-3


def test_perpendicular(rng):
    l1, (s1, e1, _) = rand_segs(rng, 16, 3)
    l2, (s2, e2, _) = rand_segs(rng, 16, 3)
    out = np.asarray(ld.dist_endpoints_perpendicular(l1, l2))
    for i in range(16):
        ref = max(ref_perp_oneway(s1[i], e1[i], s2[i], e2[i]),
                  ref_perp_oneway(s2[i], e2[i], s1[i], e1[i]))
        assert abs(out[i] - ref) < 1e-3


def test_overlap_bioverlap(rng):
    l1, (s1, e1, _) = rand_segs(rng, 16, 2)
    l2, (s2, e2, _) = rand_segs(rng, 16, 2)
    ov = np.asarray(ld.compute_overlap(l1, l2))
    bi = np.asarray(ld.compute_bioverlap(l1, l2))
    for i in range(16):
        r1 = ref_overlap(s1[i], e1[i], s2[i], e2[i])
        r2 = ref_overlap(s2[i], e2[i], s1[i], e1[i])
        assert abs(ov[i] - r1) < 1e-3
        assert abs(bi[i] - max(r1, r2)) < 1e-3


def test_innerseg(rng):
    l1, (s1, e1, _) = rand_segs(rng, 64, 2)
    l2, (s2, e2, _) = rand_segs(rng, 64, 2)
    out = np.asarray(ld.dist_innerseg(l1, l2))
    n_finite = 0
    for i in range(64):
        ref = ref_innerseg(s1[i], e1[i], s2[i], e2[i])
        if ref >= ld.MAX_DIST:
            assert out[i] >= ld.MAX_DIST * 0.99
        else:
            n_finite += 1
            assert abs(out[i] - ref) < 1e-2
    assert n_finite > 5  # sanity: test hits the finite branch


def test_scaleinv_line3dpp(rng):
    l1, (s1, e1, d1) = rand_segs(rng, 16, 3, with_depths=True)
    l2, (s2, e2, d2) = rand_segs(rng, 16, 3, with_depths=True)
    out = np.asarray(
        ld.dist_endpoints_perpendicular_scaleinv_line3dpp_oneway(l1, l2))
    for i in range(16):
        v2 = (e2[i] - s2[i]) / np.linalg.norm(e2[i] - s2[i])
        def perp(p):
            disp = p - s2[i]
            return np.sqrt(max(disp @ disp - (disp @ v2) ** 2, 0.0))
        ref = max(perp(s1[i]) / d1[i][0], perp(e1[i]) / d1[i][1])
        assert abs(out[i] - ref) < 1e-3


def test_infinite_dist_perpendicular():
    # two skew lines with known distance
    l1 = np_seg([[0, 0, 0]], [[1, 0, 0]])
    l2 = np_seg([[0, 0, 1]], [[0, 1, 1]])
    out = float(ld.infinite_dist_perpendicular(l1, l2)[0])
    assert abs(out - 1.0) < 1e-4
    # parallel lines
    l3 = np_seg([[0, 2, 0]], [[1, 2, 0]])
    out = float(ld.infinite_dist_perpendicular(l1, l3)[0])
    assert abs(out - 2.0) < 1e-4


def test_minpoint_3d():
    # l1 entirely 'before' l2: closest point is l1.start projection
    l1 = np_seg([[0, 0, 5]], [[0, 0, 9]])
    l2 = np_seg([[0, 0, 0]], [[1, 0, 0]])
    # distance from segment l1 to infinite line l2: start of l1 at dist 5
    out = float(ld.dist_minpoint_oneway(l1, l2)[0])
    assert abs(out - 5.0) < 1e-3


def test_pairwise_matrix(rng):
    l1, _ = rand_segs(rng, 8, 3)
    l2, _ = rand_segs(rng, 11, 3)
    D = np.asarray(ld.pairwise(l1, l2, "midpoint"))
    assert D.shape == (8, 11)
    m1 = np.asarray(l1.midpoint())
    m2 = np.asarray(l2.midpoint())
    ref = np.linalg.norm(m1[:, None] - m2[None], axis=-1)
    np.testing.assert_allclose(D, ref, atol=1e-4)


def test_dispatcher_rejects_2d_scaleinv(rng):
    l1, _ = rand_segs(rng, 4, 2)
    with pytest.raises(ValueError):
        ld.compute_distance(l1, l1, "perpendicular_scaleinv")
    with pytest.raises(ValueError):
        ld.compute_distance(l1, l1, "not_a_distance")
