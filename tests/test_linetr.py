"""LineTR port: numeric parity with the vendored torch implementation,
tokenizer invariants, and the extractor/matcher round trip."""

import sys

import numpy as np
import pytest

import tests.conftest  # noqa: F401

pytestmark = pytest.mark.slow

from limap_tpu.line2d import linetr


def _torch_model():
    torch = pytest.importorskip("torch")
    import types

    if "pycolmap" not in sys.modules:
        stub = types.ModuleType("pycolmap")

        class _L:
            def info(self, *a, **k):
                pass

        stub.logging = _L()
        sys.modules["pycolmap"] = stub
    # the reference package uses relative imports; load as a package
    import importlib.util
    import os

    pkg_dir = "/root/reference/src/limap/line2d/LineTR"
    if "linetr_ref" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "linetr_ref", os.path.join(pkg_dir, "__init__.py"),
            submodule_search_locations=[pkg_dir])
        pkg = importlib.util.module_from_spec(spec)
        sys.modules["linetr_ref"] = pkg
        # the relative imports inside need the parent package context
        for name in ("line_attention", "line_process",
                     "line_transformer"):
            sp = importlib.util.spec_from_file_location(
                f"linetr_ref.{name}", os.path.join(pkg_dir, name + ".py"))
            mod = importlib.util.module_from_spec(sp)
            mod.__package__ = "linetr_ref"
            sys.modules[f"linetr_ref.{name}"] = mod
            sp.loader.exec_module(mod)
    lt = sys.modules["linetr_ref.line_transformer"]
    model = lt.LineTransformer({"mode": "train"}).eval()
    return torch, model


def _synth_inputs(rng, S=10, W=21):
    sublines = (rng.random((S, 2, 2)) * [600, 440]).astype(np.float32)
    resp = rng.random((S, 1)).astype(np.float32)
    angle = (rng.random((S, 2)) * 2 - 1).astype(np.float32)
    pnt = (rng.random((S, W, 2)) * [600, 440]).astype(np.float32)
    desc = rng.random((S, W, 256)).astype(np.float32)
    score = rng.random((S, W, 1)).astype(np.float32)
    mask = np.ones((S, W + 1, 1), np.float32)
    mask[:, -3:] = 0  # some padded tokens
    return sublines, resp, angle, pnt, desc, score, mask


def test_forward_parity_with_torch(rng):
    torch, model = _torch_model()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = linetr.load_torch_state_dict(sd)
    sub, resp, ang, pnt, desc, score, mask = _synth_inputs(rng)

    data = {
        "klines": torch.tensor(sub)[None],
        "sublines": torch.tensor(sub)[None],
        "resp_sublines": torch.tensor(resp)[None],
        "angle_sublines": torch.tensor(ang)[None],
        "pnt_sublines": torch.tensor(pnt)[None],
        "desc_sublines": torch.tensor(desc)[None],
        "score_sublines": torch.tensor(score)[None],
        "mask_sublines": torch.tensor(mask)[None],
    }
    with torch.no_grad():
        ref = model(data)["line_descriptors"][0].numpy().T  # [S, 256]

    sub_n, pnt_n = linetr.normalize_keylines(sub, pnt, (480, 640))
    out = np.asarray(linetr.linetr_forward(
        params, sub_n.astype(np.float32), resp, ang,
        pnt_n.astype(np.float32), desc, score, mask))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 5e-3, np.abs(out - ref).max()


def test_spec_covers_torch_state_dict():
    _, model = _torch_model()
    torch_keys = {k for k in model.state_dict()
                  if not k.endswith("num_batches_tracked")}
    spec_keys = {k for k, _ in linetr._spec()}
    assert spec_keys == torch_keys, (
        sorted(spec_keys - torch_keys)[:6],
        sorted(torch_keys - spec_keys)[:6])


def test_tokenizer_invariants():
    klines = np.array([[[10.0, 10.0], [250.0, 20.0]],
                       [[30.0, 100.0], [60.0, 110.0]]])
    slines, tokens, masks, resp, ang, k2s = linetr.tokenize(
        klines, token_distance=8.0, max_tokens=21,
        image_shape=(480, 640))
    # long line splits into 2 sublines, short into 1
    assert k2s.shape[0] == 2 and slines.shape[0] == k2s.shape[1] == 3
    assert np.allclose(k2s.sum(axis=1), 1.0)
    # subline chain covers the keyline
    assert np.allclose(slines[0][0], klines[0][0])
    assert np.allclose(slines[1][1], klines[0][1])
    assert np.allclose(slines[0][1], slines[1][0])
    # masks: CLS + valid token count
    assert masks.shape == (3, 22, 1)
    assert masks[0, 0, 0] == 1


def test_extractor_matcher_roundtrip(rng):
    img = (rng.random((120, 160)) * 255).astype(np.uint8)
    segs = np.array([[10.0, 10, 100, 14, 1], [20, 40, 130, 44, 1],
                     [30, 80, 40, 110, 1]])

    class _View:
        def read_image(self, set_gray=True):
            return img

    ex = linetr.LineTRExtractor({"seed": 0})
    d = ex.extract(_View(), segs)
    assert d["line_descriptors"].shape[1] == 256
    assert d["mat_klines2sublines"].shape[0] == 3
    matcher = linetr.LineTRMatcher(ex, {"topk": 0, "nn_threshold": 2.0})
    m = matcher.match_pair(d, d)
    assert sorted(map(tuple, m)) == [(0, 0), (1, 1), (2, 2)]
