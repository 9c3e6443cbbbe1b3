"""HAWPv3 / TP-LSD counterparts: decode correctness on ground-truth
fields, loader validation, registry + real-frame smoke."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax.numpy as jnp

from limap_tpu.line2d import hawpv3, tp_lsd


def test_tplsd_decode_recovers_segments():
    """Planted center peaks + displacement vectors decode exactly."""
    H, W = 64, 64
    center = np.zeros((H, W), np.float32)
    disp = np.zeros((H, W, 4), np.float32)
    gt = [((20, 30), (-10.0, -5.0, 10.0, 5.0)),
          ((40, 10), (-8.0, 2.0, 8.0, -2.0))]
    for (y, x), d in gt:
        center[y, x] = 0.9
        disp[y, x] = d
    segs, count = tp_lsd.tplsd_decode(jnp.asarray(center),
                                      jnp.asarray(disp), 16)
    segs = np.asarray(segs)[:int(count)]
    assert int(count) == 2
    want = sorted([(x + d[0], y + d[1], x + d[2], y + d[3])
                   for (y, x), d in gt])
    got = sorted(map(tuple, segs[:, :4]))
    assert np.allclose(want, got, atol=1e-4)


def test_loaders_strict():
    for mod in (hawpv3, tp_lsd):
        sd = {k: np.zeros(s, np.float32) for k, s in mod._spec()}
        loaded = mod.load_torch_state_dict(sd)
        assert set(loaded) == {k for k, _ in mod._spec()}
        bad = dict(sd)
        key = next(iter(bad))
        bad[key] = np.zeros((1, 2, 3), np.float32)
        with pytest.raises(ValueError):
            mod.load_torch_state_dict(bad)


def test_detectors_registered_and_run(rng):
    from limap_tpu.line2d.base import get_detector

    img = (rng.random((96, 128)) * 255).astype(np.uint8)

    class _View:
        def read_image(self, set_gray=True):
            return img

    for method in ("hawpv3", "tp_lsd"):
        det = get_detector({"method": method, "seed": 0})
        segs = det.detect(_View())
        assert segs.ndim == 2 and segs.shape[1] == 5
