"""Detector/extractor/matcher smoke + quality tests on synthetic images
(the reference's runners/tests/line2d.py analog, SURVEY.md §4)."""

import numpy as np
import pytest

from limap_tpu.line2d.endpoints import (NNEndpointsMatcher,
                                        PatchEndpointsExtractor)
from limap_tpu.line2d.tpu_lsd import detect_segments


def draw_synthetic_image(rng, H=240, W=320, n_lines=6, thickness=2):
    """White background with dark straight segments."""
    import cv2
    img = np.full((H, W), 220, np.uint8)
    gt = []
    for _ in range(n_lines):
        while True:
            p1 = rng.uniform([20, 20], [W - 20, H - 20])
            p2 = rng.uniform([20, 20], [W - 20, H - 20])
            if np.linalg.norm(p2 - p1) > 60:
                break
        cv2.line(img, tuple(p1.astype(int)), tuple(p2.astype(int)), 40,
                 thickness)
        gt.append(np.concatenate([p1, p2]))
    noise = rng.normal(size=(H, W)) * 3
    img = np.clip(img.astype(np.float64) + noise, 0, 255).astype(np.uint8)
    return img, np.asarray(gt)


def seg_to_gt_dist(seg, gt):
    """Symmetric endpoint distance to the closest GT segment."""
    d1 = (np.linalg.norm(seg[:2] - gt[:, :2], axis=1)
          + np.linalg.norm(seg[2:4] - gt[:, 2:4], axis=1))
    d2 = (np.linalg.norm(seg[:2] - gt[:, 2:4], axis=1)
          + np.linalg.norm(seg[2:4] - gt[:, :2], axis=1))
    return np.minimum(d1, d2).min()


def gt_coverage(gt_line, segs, perp_th=4.0, angle_th_deg=5.0):
    """Fraction of the GT segment covered by aligned detections
    (detectors legitimately fragment lines at crossings, like real LSD)."""
    p1, p2 = gt_line[:2], gt_line[2:4]
    d = p2 - p1
    L = np.linalg.norm(d)
    d = d / L
    covered = np.zeros(100, bool)
    for s in segs:
        sd = s[2:4] - s[:2]
        sl = np.linalg.norm(sd)
        if sl < 1:
            continue
        sd = sd / sl
        ang = np.degrees(np.arccos(min(abs(sd @ d), 1.0)))
        if ang > angle_th_deg:
            continue
        perp = max(abs(d[0] * (s[1] - p1[1]) - d[1] * (s[0] - p1[0])),
                   abs(d[0] * (s[3] - p1[1]) - d[1] * (s[2] - p1[0])))
        if perp > perp_th:
            continue
        t1 = (s[:2] - p1) @ d / L
        t2 = (s[2:4] - p1) @ d / L
        lo, hi = sorted((t1, t2))
        lo = max(int(np.floor(lo * 100)), 0)
        hi = min(int(np.ceil(hi * 100)), 100)
        covered[lo:hi] = True
    return covered.mean()


def test_tpu_lsd_detects_synthetic_lines(rng):
    img, gt = draw_synthetic_image(rng)
    segs = detect_segments(img, grad_th=0.05)
    assert len(segs) >= len(gt)
    coverages = [gt_coverage(g, segs) for g in gt]
    assert sum(c > 0.6 for c in coverages) >= len(gt) - 1, coverages


def test_endpoint_matcher_on_shifted_image(rng):
    """Same lines, image shifted by a few pixels: matcher should recover
    the identity correspondence."""
    import cv2
    img, gt = draw_synthetic_image(rng, n_lines=8)
    shift = np.float32([[1, 0, 3.0], [0, 1, 2.0]])
    img2 = cv2.warpAffine(img, shift, (img.shape[1], img.shape[0]),
                          borderValue=220)
    segs1 = np.concatenate(
        [gt, np.ones((len(gt), 1))], axis=1)
    gt2 = gt.copy()
    gt2[:, [0, 2]] += 3.0
    gt2[:, [1, 3]] += 2.0
    segs2 = np.concatenate([gt2, np.ones((len(gt), 1))], axis=1)

    ext = PatchEndpointsExtractor()
    d1 = ext.compute_descinfo(img, segs1)
    d2 = ext.compute_descinfo(img2, segs2)
    matcher = NNEndpointsMatcher(ext, {"topk": 0})
    matches = matcher.match_pair(d1, d2)
    assert len(matches) >= len(gt) * 0.7
    correct = (matches[:, 0] == matches[:, 1]).mean()
    assert correct > 0.8


def test_topk_matching_contains_truth(rng):
    img, gt = draw_synthetic_image(rng, n_lines=8)
    segs = np.concatenate([gt, np.ones((len(gt), 1))], axis=1)
    ext = PatchEndpointsExtractor()
    d = ext.compute_descinfo(img, segs)
    matcher = NNEndpointsMatcher(ext, {"topk": 3})
    matches = matcher.match_pair(d, d)
    for i in range(len(gt)):
        assert [i, i] in matches.tolist()


def test_merge_lines():
    from limap_tpu.line2d.line_utils import merge_lines
    segs = np.array([[0, 0, 40, 0, 1.0], [45, 0.5, 100, 0.5, 1.0],
                     [0, 50, 100, 50, 1.0]])
    out = merge_lines(segs)
    assert len(out) == 2
    lengths = np.linalg.norm(out[:, 2:4] - out[:, :2], axis=1)
    assert lengths.max() > 95  # the two collinear pieces merged


def test_sinkhorn_endpoint_matcher(rng):
    from limap_tpu.line2d.base import MATCHER_REGISTRY
    from limap_tpu.line2d.endpoints import (PatchEndpointsExtractor,
                                            SinkhornEndpointsMatcher)
    assert "superglue_endpoints" in MATCHER_REGISTRY
    img, gt = draw_synthetic_image(rng, n_lines=6)
    segs = np.concatenate([gt, np.ones((len(gt), 1))], axis=1)
    ext = PatchEndpointsExtractor()
    d = ext.compute_descinfo(img, segs)
    matcher = SinkhornEndpointsMatcher(ext, {"match_threshold": 0.12})
    matches = matcher.match_pair(d, d)
    correct = (matches[:, 0] == matches[:, 1]).mean() if len(matches) else 0
    assert len(matches) >= 4 and correct > 0.7


def test_batched_endpoint_descinfos_match_per_image(rng):
    """compute_descinfos_batch == per-image compute_descinfo, and
    batched_match_pairs reproduces per-pair matching."""
    from limap_tpu.line2d.endpoints import (PatchEndpointsExtractor,
                                            batched_match_pairs,
                                            compute_descinfos_batch)
    imgs = {}
    segs = {}
    for i in range(3):
        imgs[i] = (rng.uniform(0, 255, size=(64, 80))).astype(np.uint8)
        s = rng.uniform(5, 60, size=(4 + i, 4))
        segs[i] = np.concatenate(
            [s, rng.uniform(0.5, 1, size=(len(s), 1))], 1)
    ex = PatchEndpointsExtractor({})
    batch = compute_descinfos_batch(imgs, segs)
    for i in imgs:
        single = ex.compute_descinfo(imgs[i], segs[i])
        np.testing.assert_allclose(batch[i]["endpoints_desc"],
                                   single["endpoints_desc"], atol=1e-5)
        np.testing.assert_allclose(batch[i]["lines_score"],
                                   single["lines_score"], atol=1e-6)
    pairs = [(0, 1), (1, 2), (2, 0)]
    res = batched_match_pairs(batch, pairs, topk=2, min_score=-10.0)
    for (a, b) in pairs:
        d1 = batch[a]["endpoints_desc"]
        d2 = batch[b]["endpoints_desc"]
        s = d1.T @ d2
        n1, n2 = s.shape[0] // 2, s.shape[1] // 2
        s = s.reshape(n1, 2, n2, 2)
        ls = 0.5 * np.maximum(s[:, 0, :, 0] + s[:, 1, :, 1],
                              s[:, 0, :, 1] + s[:, 1, :, 0])
        expect = np.argsort(-ls, 1)[:, :2]
        got = res[(a, b)].reshape(n1, 2, 2)[..., 1]
        assert np.array_equal(np.sort(expect, 1), np.sort(got, 1))


def test_match_all_neighbors_batched_equals_two_stage(rng):
    """Fused device-resident describe+match == separate batch extract
    + batched pair matching."""
    from limap_tpu.line2d.endpoints import (batched_match_pairs,
                                            compute_descinfos_batch,
                                            match_all_neighbors_batched)
    imgs = {i: rng.uniform(0, 255, size=(64, 80)).astype(np.uint8)
            for i in range(4)}
    segs = {i: rng.uniform(5, 60, size=(5 + i, 4)) for i in range(4)}
    nbrs = {i: [j for j in range(4) if j != i] for i in range(4)}
    fused = match_all_neighbors_batched(imgs, segs, nbrs, topk=2,
                                        min_score=-10.0)
    descinfos = compute_descinfos_batch(imgs, segs)
    pairs = [(i, j) for i in sorted(nbrs) for j in nbrs[i]]
    two = batched_match_pairs(descinfos, pairs, topk=2, min_score=-10.0)
    for (a, b) in pairs:
        assert np.array_equal(fused[a][b], two[(a, b)]), (a, b)


def test_nn_endpoints_batched_match_all_neighbors(rng, tmp_path):
    """The batched match_all_neighbors override writes the same
    matches_{id}.npy files as the generic per-pair loop."""
    from limap_tpu.line2d import get_matcher
    from limap_tpu.line2d.endpoints import (PatchEndpointsExtractor,
                                            compute_descinfos_batch)
    imgs = {i: rng.uniform(0, 255, size=(64, 80)).astype(np.uint8)
            for i in range(4)}
    segs = {i: rng.uniform(5, 60, size=(5 + i, 4)) for i in range(4)}
    nbrs = {i: [j for j in range(4) if j != i] for i in range(4)}
    ex = PatchEndpointsExtractor({})
    dfolder = str(tmp_path / "descinfos")
    descinfos = compute_descinfos_batch(imgs, segs)
    for i in imgs:
        ex.save_descinfo(dfolder, i, descinfos[i])

    m = get_matcher({"method": "nn_endpoints", "topk": 2,
                     "min_score": -10.0}, ex)
    out_b = str(tmp_path / "out_batched")
    folder_b = m.match_all_neighbors(out_b, list(imgs), nbrs, dfolder)
    # generic path via the base implementation
    from limap_tpu.line2d.base import BaseMatcher
    out_g = str(tmp_path / "out_generic")
    folder_g = BaseMatcher.match_all_neighbors(
        m, out_g, list(imgs), nbrs, dfolder)
    for i in imgs:
        mb = m.read_match(folder_b, i)
        mg = m.read_match(folder_g, i)
        assert set(mb) == set(mg)
        for ng in mb:
            assert np.array_equal(np.sort(np.asarray(mb[ng]), axis=0),
                                  np.sort(np.asarray(mg[ng]), axis=0)), \
                (i, ng)
