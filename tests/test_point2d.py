import numpy as np
import pytest

from limap_tpu.point2d import (HarrisPatchExtractor, SuperPoint,
                               mutual_nn_match, sinkhorn_match)


def checkerboard(rng, H=160, W=200, n=8):
    img = np.zeros((H, W), np.uint8)
    bh, bw = H // n, W // n
    for i in range(n):
        for j in range(n):
            if (i + j) % 2 == 0:
                img[i * bh:(i + 1) * bh, j * bw:(j + 1) * bw] = 200
    img = np.clip(img + rng.normal(size=(H, W)) * 3, 0, 255).astype(np.uint8)
    return img


def test_harris_extractor_and_matching(rng):
    img = checkerboard(rng)
    ext = HarrisPatchExtractor(max_keypoints=256)
    out1 = ext(img)
    assert len(out1["keypoints"]) > 20
    # shifted copy matches back to itself
    import cv2
    M = np.float32([[1, 0, 2], [0, 1, 1]])
    img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
    out2 = ext(img2)
    matches = mutual_nn_match(out1["descriptors"], out2["descriptors"],
                              min_score=0.8)
    assert len(matches) > 10
    # matched displacement close to the shift
    d = out2["keypoints"][matches[:, 1]] - out1["keypoints"][matches[:, 0]]
    med = np.median(d, axis=0)
    assert abs(med[0] - 2) < 1.5 and abs(med[1] - 1) < 1.5


def test_sinkhorn_match_identity(rng):
    desc = rng.normal(size=(30, 64))
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    m = sinkhorn_match(desc, desc, match_threshold=0.1)
    assert len(m) >= 25
    assert (m[:, 0] == m[:, 1]).all()


@pytest.mark.slow
def test_superpoint_architecture_runs(rng):
    """No pretrained weights in this environment — verify the net runs
    and produces well-formed outputs with random init."""
    sp = SuperPoint(max_keypoints=128, keypoint_threshold=1e-4)
    img = checkerboard(rng)
    out = sp(img)
    assert out["descriptors"].shape[1] == 256
    assert out["keypoints"].shape[0] == out["descriptors"].shape[0]
