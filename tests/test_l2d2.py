"""L2D2 port: numeric parity with the in-tree torch network, patch
extraction, and the extractor/matcher plugin round trip."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

pytestmark = pytest.mark.slow

from limap_tpu.line2d import l2d2


def _torch_net():
    torch = pytest.importorskip("torch")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ral_net", "/root/reference/src/limap/line2d/L2D2/RAL_net_cov.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    net = mod.get_net().eval()
    return torch, net


def test_forward_parity_with_torch():
    import jax

    torch, net = _torch_net()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = l2d2.load_torch_state_dict(sd)
    rng = np.random.default_rng(0)
    patches = rng.random((6, 48, 32, 1), np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(patches.transpose(0, 3, 1, 2))).numpy()
    from limap_tpu.line2d.sold2 import nets as sold2_nets

    out = np.asarray(l2d2.l2d2_forward(params, patches))
    assert out.shape == ref.shape == (6, 128)
    assert np.abs(out - ref).max() < 5e-3, np.abs(out - ref).max()
    # descriptors are unit-norm
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_spec_covers_torch_state_dict():
    _, net = _torch_net()
    torch_keys = {k for k in net.state_dict()
                  if not k.endswith("num_batches_tracked")}
    spec_keys = {k for k, _ in l2d2._spec()}
    assert spec_keys == torch_keys, (
        sorted(spec_keys - torch_keys), sorted(torch_keys - spec_keys))


def test_extract_and_match_roundtrip():
    rng = np.random.default_rng(0)
    img = (rng.random((120, 160)) * 255).astype(np.uint8)
    segs = np.array([[10.0, 10, 100, 12, 1], [20, 40, 120, 44, 1],
                     [30, 80, 140, 70, 1]])

    class _View:
        def read_image(self, set_gray=True):
            return img

    ex = l2d2.L2D2Extractor({"seed": 0})
    d1 = ex.extract(_View(), segs)
    assert d1["line_descriptors"].shape == (3, 128)
    matcher = l2d2.L2D2Matcher(ex, {"topk": 0})
    m = matcher.match_pair(d1, d1)
    # self-matching is the identity under mutual NN
    assert sorted(map(tuple, m)) == [(0, 0), (1, 1), (2, 2)]
