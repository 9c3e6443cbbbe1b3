"""DeepLSD port tests: forward shapes/determinism, strict checkpoint
validation, synthetic-field extraction quality, real-frame smoke."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from limap_tpu.line2d import deeplsd


def test_forward_shapes_and_determinism():
    params = deeplsd.init_params(0)
    img = np.random.default_rng(1).random((1, 32, 48, 1), np.float32)
    out1 = deeplsd.deeplsd_forward(params, img)
    out2 = deeplsd.deeplsd_forward(params, img)
    assert out1["df"].shape == (1, 32, 48)
    assert out1["angle"].shape == (1, 32, 48)
    assert np.array_equal(np.asarray(out1["df"]), np.asarray(out2["df"]))
    a = np.asarray(out1["angle"])
    assert (a >= 0).all() and (a <= np.pi).all()
    assert (np.asarray(out1["df"]) >= 0).all()


def test_loader_strict_validation():
    params = deeplsd.init_params(0)
    # build a fake torch-layout state dict from the spec
    sd = {}
    for key, shape in deeplsd._spec():
        sd[key] = np.zeros(shape, np.float32)
    loaded = deeplsd.load_torch_state_dict(sd)
    assert set(loaded) == set(params)
    # missing key -> precise error
    del sd["df_head.0.weight"]
    with pytest.raises(ValueError, match="missing df_head.0.weight"):
        deeplsd.load_torch_state_dict(sd)
    # wrong shape -> precise error
    sd["df_head.0.weight"] = np.zeros((3, 3, 3, 3), np.float32)
    with pytest.raises(ValueError, match="df_head.0.weight"):
        deeplsd.load_torch_state_dict(sd)
    # key_map renaming path
    sd2 = {("model." + k): np.zeros(s, np.float32)
           for k, s in deeplsd._spec()}
    loaded2 = deeplsd.load_torch_state_dict(
        sd2, key_map={("model." + k): k for k, _ in deeplsd._spec()})
    assert set(loaded2) == set(params)


def test_extraction_from_synthetic_fields():
    """A ground-truth attraction field of two segments is recovered."""
    H, W = 96, 96
    segs_gt = np.array([[[20.0, 10.0], [20.0, 80.0]],    # horizontal row 20
                        [[40.0, 30.0], [85.0, 30.0]]])   # vertical col 30
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    df = np.full((H, W), 10.0)
    ang = np.zeros((H, W))
    for (p0, p1) in segs_gt:
        d = p1 - p0
        length = np.linalg.norm(d)
        u = d / length
        t = np.clip((yy - p0[0]) * u[0] + (xx - p0[1]) * u[1], 0, length)
        cy = p0[0] + t * u[0]
        cx = p0[1] + t * u[1]
        dist = np.hypot(yy - cy, xx - cx)
        closer = dist < df
        df = np.where(closer, dist, df)
        # level-line angle in image (x, y) convention: direction of the
        # segment, mod pi
        seg_ang = np.mod(np.arctan2(d[0], d[1]), np.pi)
        ang = np.where(closer, seg_ang, ang)

    segs, count = deeplsd.extract_from_fields(
        df.astype(np.float32), ang.astype(np.float32), df_thresh=1.2)
    segs = np.asarray(segs)[:int(count)]
    assert count >= 2
    # both GT segments found (endpoints within a few px, either order)
    for (p0, p1) in segs_gt:
        want = np.array([p0[1], p0[0], p1[1], p1[0]])  # to x1 y1 x2 y2
        found = False
        for s in segs[:, :4]:
            for cand in (s, s[[2, 3, 0, 1]]):
                if np.abs(cand - want).max() < 4.0:
                    found = True
        assert found, (want, segs[:4])


def test_detector_smoke_on_real_frame():
    import os

    frame_dir = "/root/reference/runners/tests/data/line2d"
    if not os.path.isdir(frame_dir):
        pytest.skip("no reference frames")
    frames = sorted(os.listdir(frame_dir))

    class _View:
        def read_image(self, set_gray=True):
            import cv2

            img = cv2.imread(os.path.join(frame_dir, frames[0]),
                             cv2.IMREAD_GRAYSCALE)
            return img[:120, :160]

    det = deeplsd.DeepLSDDetector({"seed": 0})
    segs = det.detect(_View())
    assert segs.ndim == 2 and segs.shape[1] == 5


def test_registered():
    from limap_tpu.line2d.base import get_detector

    det = get_detector({"method": "deeplsd"})
    assert det.get_module_name() == "deeplsd"
