"""SuperGlue port tests: numeric parity of the JAX forward against the
reference's in-tree torch implementation (random weights), strict
checkpoint key-spec, OT head and match selection."""

import sys
import types

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (forces CPU backend)

pytestmark = pytest.mark.slow


def _load_torch_superglue():
    """Instantiate the reference torch SuperGlue with random init
    (weight download is impossible in-env, so loading is bypassed
    while keeping the exact module structure / state_dict keys)."""
    torch = pytest.importorskip("torch")
    if "pycolmap" not in sys.modules:
        stub = types.ModuleType("pycolmap")

        class _Log:
            def info(self, *a, **k):
                pass

        stub.logging = _Log()
        sys.modules["pycolmap"] = stub
    sys.path.insert(0, "/root/reference/src/limap/point2d/superglue")
    import superglue as ref_sg

    class _SG(ref_sg.SuperGlue):
        def load_state_dict(self, sd, **kw):  # random init stays
            return

        def download_model(self, path):
            import os

            os.makedirs(os.path.dirname(path), exist_ok=True)
            torch.save({}, path)

    model = _SG({"weight_path": "/tmp/sg_test_weights"}).eval()
    return torch, ref_sg, model


@pytest.fixture(scope="module")
def torch_and_model():
    return _load_torch_superglue()


def _random_inputs(rng, n0, n1, h=480, w=640):
    return {
        "image_shape0": (h, w),
        "image_shape1": (h, w),
        "keypoints0": rng.uniform(0, w, size=(n0, 2)).astype(np.float32),
        "keypoints1": rng.uniform(0, w, size=(n1, 2)).astype(np.float32),
        "scores0": rng.uniform(size=n0).astype(np.float32),
        "scores1": rng.uniform(size=n1).astype(np.float32),
        "descriptors0": rng.normal(size=(256, n0)).astype(np.float32),
        "descriptors1": rng.normal(size=(256, n1)).astype(np.float32),
    }


def test_key_spec_matches_torch_state_dict(torch_and_model):
    """The strict loader's key/shape spec is exactly the torch model's
    state_dict (= the published checkpoints' layout)."""
    from limap_tpu.point2d import superglue as jsg

    _, _, model = torch_and_model
    sd = model.state_dict()
    torch_keys = {k for k in sd if not k.endswith("num_batches_tracked")}
    spec = jsg.key_spec()
    assert set(spec) == torch_keys
    for k in torch_keys:
        assert tuple(sd[k].shape) == tuple(spec[k]), k


def test_forward_scores_parity(torch_and_model):
    """Encoder + 18-layer GNN + final projection produce the same raw
    score matrix as the torch reference (random weights)."""
    torch, _, model = torch_and_model
    from limap_tpu.point2d import superglue as jsg

    params = jsg.params_from_state_dict(model.state_dict())
    rng = np.random.default_rng(0)
    data = _random_inputs(rng, 37, 29)

    tdata = {
        "image_shape0": data["image_shape0"],
        "image_shape1": data["image_shape1"],
        "keypoints0": torch.tensor(data["keypoints0"][None]),
        "keypoints1": torch.tensor(data["keypoints1"][None]),
        "scores0": torch.tensor(data["scores0"][None]),
        "scores1": torch.tensor(data["scores1"][None]),
        "descriptors0": torch.tensor(data["descriptors0"][None]),
        "descriptors1": torch.tensor(data["descriptors1"][None]),
    }
    with torch.no_grad():
        out = model(tdata)
    ref_raw = out["scores"].numpy()[0]

    sg = jsg.SuperGlue.__new__(jsg.SuperGlue)
    sg.params = {k: v for k, v in params.items()}
    sg.match_threshold = jsg.MATCH_THRESHOLD
    sg.sinkhorn_iterations = jsg.SINKHORN_ITERATIONS
    raw = np.asarray(sg.scores(data))
    assert np.allclose(raw, ref_raw, atol=2e-3), (
        np.abs(raw - ref_raw).max())

    # OT head + match selection parity on the same scores
    Z = np.asarray(sg.solve_optimal_transport(raw))
    with torch.no_grad():
        Zt = model._solve_optimal_transport(
            torch.tensor(ref_raw[None]))
        m0t, m1t, ms0t, _ = model._get_matches(Zt)
    assert np.allclose(Z, Zt.numpy()[0], atol=1e-4)
    m0, m1, ms0, _ = jsg.get_matches(Z)
    assert np.array_equal(m0, m0t.numpy()[0])
    assert np.array_equal(m1, m1t.numpy()[0])
    assert np.allclose(ms0, ms0t.numpy()[0], atol=1e-4)


def test_superglue_endpoints_matcher(torch_and_model):
    """The superglue_endpoints line matcher combines endpoint scores
    exactly like the reference (endpoints/matcher.py:114-253)."""
    torch, _, model = torch_and_model
    from limap_tpu.line2d import get_matcher
    from limap_tpu.point2d import superglue as jsg

    rng = np.random.default_rng(1)
    n1, n2 = 11, 13

    def descinfo(n):
        lines = rng.uniform(50, 400, size=(2 * n, 2)).astype(np.float32)
        return {
            "image_shape": (480, 640),
            "lines": lines,
            "lines_score": rng.uniform(0.3, 1.0, size=n).astype(
                np.float32),
            "endpoints_desc": rng.normal(size=(256, 2 * n)).astype(
                np.float32),
        }

    d1, d2 = descinfo(n1), descinfo(n2)

    class _FakeExtractor:
        def get_module_name(self):
            return "superpoint_endpoints"

    matcher = get_matcher({"method": "superglue_endpoints", "topk": 0},
                          _FakeExtractor())
    matcher.sg.params = {k: np.asarray(v) for k, v in
                         jsg.params_from_state_dict(
                             model.state_dict()).items()}
    matches = matcher.match_pair(d1, d2)

    # reference combination, computed with the torch model
    tdata = {
        "image_shape0": d1["image_shape"],
        "image_shape1": d2["image_shape"],
        "keypoints0": torch.tensor(d1["lines"][None]),
        "keypoints1": torch.tensor(d2["lines"][None]),
        "scores0": torch.tensor(
            d1["lines_score"].repeat(2)[None]),
        "scores1": torch.tensor(
            d2["lines_score"].repeat(2)[None]),
        "descriptors0": torch.tensor(d1["endpoints_desc"][None]),
        "descriptors1": torch.tensor(d2["endpoints_desc"][None]),
    }
    with torch.no_grad():
        out = model(tdata)
        scores = out["scores"].reshape(n1, 2, n2, 2)
        scores = 0.5 * torch.maximum(
            scores[:, 0, :, 0] + scores[:, 1, :, 1],
            scores[:, 0, :, 1] + scores[:, 1, :, 0])
        Z = model._solve_optimal_transport(scores[None])
        m0 = model._get_matches(Z)[0].numpy()[0]
    ids1 = np.arange(n1)[m0 != -1]
    ids2 = m0[m0 != -1]
    ref_matches = np.stack([ids1, ids2], 1)
    assert np.array_equal(np.asarray(matches), ref_matches)


def test_match_empty():
    from limap_tpu.point2d import superglue as jsg

    sg = jsg.SuperGlue(weight_path=None)
    out = sg({"keypoints0": np.zeros((0, 2)),
              "keypoints1": np.zeros((3, 2)),
              "scores0": np.zeros(0), "scores1": np.zeros(3),
              "descriptors0": np.zeros((256, 0)),
              "descriptors1": np.zeros((256, 3)),
              "image_shape0": (10, 10), "image_shape1": (10, 10)})
    assert out["matches0"].shape == (0,)
    assert (out["matches1"] == -1).all()
