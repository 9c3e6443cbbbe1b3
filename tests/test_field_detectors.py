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
    for mod, spec in ((hawpv3, hawpv3.key_spec), (tp_lsd, tp_lsd._spec)):
        sd = {k: np.zeros(s, np.float32) for k, s in spec()}
        loaded = mod.load_torch_state_dict(sd)
        assert set(loaded) == {k for k, _ in spec()}
        bad = dict(sd)
        key = next(iter(bad))
        bad[key] = np.zeros((1, 2, 3), np.float32)
        with pytest.raises(ValueError):
            mod.load_torch_state_dict(bad)


def test_hawpv3_key_spec_is_published_layout():
    """The spec must follow hawp/fsl/backbones/stacked_hg.py exactly:
    stacked-hourglass module paths with the reference's hawpv3.yaml
    hyperparameters (2 stacks, depth 4, 9 output channels over 5
    multitask heads)."""
    spec = dict(hawpv3.key_spec())
    # stem
    assert spec["backbone.conv1.weight"] == (64, 1, 7, 7)
    assert spec["backbone.layer1.0.downsample.0.weight"] == (128, 64, 1, 1)
    assert spec["backbone.layer3.0.conv3.weight"] == (256, 128, 1, 1)
    # hourglass: depth-0 row has the extra 4th residual
    assert "backbone.hg.0.hg.0.3.0.conv1.weight" in spec
    assert "backbone.hg.0.hg.3.2.0.conv1.weight" in spec
    assert "backbone.hg.1.hg.0.0.0.bn1.running_mean" in spec
    # multitask head groups: out channels 3,1,1,2,2
    outs = [spec[f"backbone.score.1.heads.{m}.2.weight"][0]
            for m in range(5)]
    assert outs == [3, 1, 1, 2, 2]
    # inter-stack links exist only between stacks
    assert "backbone.fc_.0.weight" in spec
    assert "backbone.fc_.1.weight" not in spec
    assert spec["backbone.score_.0.weight"] == (256, 9, 1, 1)


def test_hawpv3_forward_and_decode(rng):
    """Random-weight forward produces the published field layout and
    the HAFM + junction decoders run end-to-end without NaNs."""
    import jax
    p = hawpv3.init_params(0)
    img = jnp.asarray(rng.random((1, 64, 64, 1)), jnp.float32)
    out = jax.jit(hawpv3.hawp_forward)(p, img)
    assert out["md"].shape == (1, 16, 16, 3)
    assert out["dis"].shape == (1, 16, 16, 1)
    assert out["jloc"].shape == (1, 16, 16, 1)
    assert out["joff"].shape == (1, 16, 16, 2)
    assert float(jnp.max(out["md"])) <= 1.0
    cand = hawpv3.hafm_decoding(np.asarray(out["md"][0]),
                                np.asarray(out["dis"][0]),
                                np.asarray(out["res"][0]))
    assert cand.shape == (3, 256, 4) and np.isfinite(cand).all()


def test_hawpv3_junction_decode_and_matching():
    jloc = np.zeros((32, 32, 1), np.float32)
    joff = np.zeros((32, 32, 2), np.float32)
    jloc[10, 5, 0] = 0.9
    jloc[20, 25, 0] = 0.8
    joff[10, 5] = [0.25, -0.25]
    pts, score = hawpv3.decode_junctions(jloc, joff)
    assert len(pts) == 2
    np.testing.assert_allclose(sorted(map(tuple, pts)),
                               [(5.75, 10.25), (25.5, 20.5)], atol=1e-5)
    # a candidate line whose endpoints are near both junctions snaps
    lines = np.array([[5.0, 10.0, 26.0, 21.0],
                      [0.0, 0.0, 1.0, 1.0]], np.float32)
    segs = hawpv3.match_lines_to_junctions(lines, pts, score,
                                           dist_th=3.0)
    assert len(segs) == 1
    assert segs[0, 4] > 0.5


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
