"""GlueStick-style GNN matcher: loader validation + functional smoke
(quality matching needs the real checkpoint, absent in this env)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

pytestmark = pytest.mark.slow

from limap_tpu.line2d import gluestick


def test_loader_strict_validation():
    sd = {k: np.zeros(s, np.float32) for k, s in gluestick._spec()}
    loaded = gluestick.load_torch_state_dict(sd)
    assert set(loaded) == {k for k, _ in gluestick._spec()}
    del sd["gnn.cross.3.attn.merge.weight"]
    with pytest.raises(ValueError, match="gnn.cross.3.attn.merge"):
        gluestick.load_torch_state_dict(sd)


def test_matcher_smoke(rng):
    img = (rng.random((96, 128)) * 255).astype(np.uint8)
    segs = np.array([[10.0, 10, 90, 14, 1], [20, 40, 110, 44, 1]])

    class _View:
        def read_image(self, set_gray=True):
            return img

    ex = gluestick.GlueStickExtractor({})
    d = ex.extract(_View(), segs)
    assert d["junctions"].shape == (4, 2)
    assert d["junc_desc"].shape[0] == 4
    matcher = gluestick.GlueStickMatcher(ex, {"seed": 0,
                                              "match_threshold": 0.0})
    m = matcher.match_pair(d, d)
    assert m.ndim == 2 and m.shape[1] == 2
    # deterministic
    m2 = matcher.match_pair(d, d)
    assert np.array_equal(m, m2)
