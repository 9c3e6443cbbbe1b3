"""LBD descriptor: invariances, discrimination, matcher round trip on
real reference frames."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax.numpy as jnp

from limap_tpu.line2d import lbd


def _img(rng, H=120, W=160):
    img = rng.random((H, W)).astype(np.float32) * 0.1
    img[40:, :] += 0.5        # horizontal edge at y=40
    img[:, 100:] += 0.3       # vertical edge at x=100
    return img


def test_descriptor_discriminates_edges(rng):
    img = _img(rng)
    segs = np.array([
        [10.0, 40.0, 150.0, 40.0],    # on the horizontal edge
        [12.0, 40.0, 148.0, 40.0],    # same edge, slightly shifted
        [100.0, 5.0, 100.0, 115.0],   # on the vertical edge
        [10.0, 90.0, 150.0, 90.0],    # featureless region
    ], np.float32)
    valid = np.ones(4, bool)
    d = np.asarray(lbd.lbd_describe(jnp.asarray(img), jnp.asarray(segs),
                                    jnp.asarray(valid)))
    assert d.shape == (4, lbd.M_BANDS * 8)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    # same-edge lines are much closer than different structures
    d_same = np.linalg.norm(d[0] - d[1])
    d_diff = np.linalg.norm(d[0] - d[2])
    assert d_same < 0.3 * d_diff, (d_same, d_diff)


def test_matcher_roundtrip_on_real_frames():
    import os

    frame_dir = "/root/reference/runners/tests/data/line2d"
    if not os.path.isdir(frame_dir):
        pytest.skip("no frames")
    import cv2

    frames = sorted(os.listdir(frame_dir))
    img = cv2.imread(os.path.join(frame_dir, frames[0]),
                     cv2.IMREAD_GRAYSCALE)[:200, :200]

    from limap_tpu.line2d.lsd import LSDDetector

    class _View:
        def read_image(self, set_gray=True):
            return img

    det = LSDDetector({})
    segs = det.detect(_View())[:32]
    assert len(segs) > 5
    ex = lbd.LBDExtractor({})
    d = ex.extract(_View(), segs)
    assert d["line_descriptors"].shape[0] == len(segs)
    matcher = lbd.LBDMatcher(ex, {"topk": 0})
    m = matcher.match_pair(d, d)
    # self-matching recovers identity for a large majority
    good = sum(1 for a, b in m if a == b)
    assert good >= 0.9 * len(segs), (good, len(segs))
