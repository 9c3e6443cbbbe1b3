"""Dense-warp line matching: the NCC flow recovers a known translation
and the ported distance/overlap logic matches shifted lines."""

import numpy as np

import tests.conftest  # noqa: F401

from limap_tpu.line2d.dense import (CorrelationFlowMatcher,
                                    DenseNaiveExtractor,
                                    NCCDenseLineMatcher)


def _textured(rng, H=160, W=200):
    img = rng.random((H, W)).astype(np.float32)
    import cv2

    return cv2.GaussianBlur(img, (0, 0), 1.5)


def test_ncc_flow_recovers_translation(rng):
    img1 = _textured(rng)
    dx, dy = 24, 16
    img2 = np.roll(np.roll(img1, dy, axis=0), dx, axis=1)
    m = CorrelationFlowMatcher()
    w12, c12, _, _ = m.get_warping_symmetric(img1, img2)
    H, W = img1.shape
    # sample interior points: warp should map p -> p + (dx, dy)
    pts = np.stack(np.meshgrid(np.arange(60, 140, 16),
                               np.arange(60, 100, 16)), -1).reshape(-1, 2)
    tgt_n = w12[pts[:, 1], pts[:, 0]]
    tgt = m.to_unnormalized_coordinates(tgt_n, H, W)
    err = np.abs(tgt - (pts + [dx, dy]))
    assert np.median(err) < 6.0, np.median(err)


def test_dense_line_matching_under_translation(rng):
    img1 = _textured(rng)
    dx, dy = 24, 16
    img2 = np.roll(np.roll(img1, dy, axis=0), dx, axis=1)
    segs1 = np.array([[40.0, 50, 120, 55, 1], [60, 90, 130, 120, 1],
                      [30, 120, 110, 125, 1]])
    segs2 = segs1.copy()
    segs2[:, [0, 2]] += dx
    segs2[:, [1, 3]] += dy
    # shuffle img2's line order
    perm = np.array([2, 0, 1])
    segs2 = segs2[perm]

    class _V1:
        def read_image(self, set_gray=True):
            return img1

    class _V2:
        def read_image(self, set_gray=True):
            return img2

    ex = DenseNaiveExtractor({})
    d1 = ex.extract(_V1(), segs1)
    d2 = ex.extract(_V2(), segs2)
    matcher = NCCDenseLineMatcher(ex, {"pixel_th": 12.0})
    m = matcher.match_pair(d1, d2)
    want = {(i, int(np.nonzero(perm == i)[0][0])) for i in range(3)}
    got = set(map(tuple, m))
    assert want <= got, (want, got)
