"""VP detection tests: synthetic segments converging to known VPs."""

import numpy as np

from limap_tpu.vplib import (GlobalVPTrackConstructor, JLinkage,
                             JLinkageConfig, VPTrack,
                             merge_vptracks_by_direction)


def segments_toward_vp(rng, vp, n, noise=0.3):
    """Segments pointing at a (possibly infinite) VP in a 640x480 frame."""
    segs = []
    for _ in range(n):
        mid = rng.uniform([50, 50], [590, 430])
        if abs(vp[2]) < 1e-9:
            d = np.array([vp[0], vp[1]])
        else:
            d = np.array([vp[0] / vp[2] - mid[0], vp[1] / vp[2] - mid[1]])
        d = d / (np.linalg.norm(d) + 1e-12)
        half = rng.uniform(25, 60)
        p1 = mid - d * half + rng.normal(size=2) * noise
        p2 = mid + d * half + rng.normal(size=2) * noise
        segs.append(np.concatenate([p1, p2]))
    return np.asarray(segs)


def test_jlinkage_two_vps(rng):
    vp1 = np.array([2000.0, 240.0, 1.0])
    vp2 = np.array([320.0, -3000.0, 1.0])
    segs = np.concatenate([
        segments_toward_vp(rng, vp1, 25),
        segments_toward_vp(rng, vp2, 25),
        # junk lines at random orientations
        segments_toward_vp(rng, np.array([1.0, 0.7, 0.0]), 3, noise=20.0),
    ])
    det = JLinkage(JLinkageConfig(min_length=30, inlier_threshold=2.0,
                                  min_num_supports=10))
    res = det.compute_vp_labels(segs)
    assert res.count_vps() >= 2
    # the two main clusters dominate and split correctly
    lab1 = res.labels[:25]
    lab2 = res.labels[25:50]
    m1 = np.bincount(lab1[lab1 >= 0]).argmax()
    m2 = np.bincount(lab2[lab2 >= 0]).argmax()
    assert m1 != m2
    assert (lab1 == m1).mean() > 0.8
    assert (lab2 == m2).mean() > 0.8
    # recovered VPs close to truth (normalize homogeneous)
    for true_vp, m in [(vp1, m1), (vp2, m2)]:
        v = res.GetVPbyCluster(m)
        v = v / np.linalg.norm(v)
        t = true_vp / np.linalg.norm(true_vp)
        assert abs(abs(v @ t) - 1.0) < 1e-4


def test_jlinkage_too_few_lines(rng):
    segs = segments_toward_vp(rng, np.array([2000.0, 240, 1]), 4)
    det = JLinkage()
    res = det.compute_vp_labels(segs)
    assert res.count_vps() == 0
    assert (res.labels == -1).all()


def test_merge_vptracks_by_direction():
    t1 = VPTrack([1.0, 0, 0], [(0, 0)])
    t2 = VPTrack([0.9999, 0.004, 0], [(1, 0)])  # ~0.23 deg away
    t3 = VPTrack([0, 1.0, 0], [(2, 0)])
    out = merge_vptracks_by_direction([t1, t2, t3], th_angle_merge=1.0)
    assert len(out) == 2
    lens = sorted(t.length() for t in out)
    assert lens == [1, 2]


def test_progressivex_finds_vps(rng):
    """Progressive-X equivalent: two synthetic pencils of lines."""
    from limap_tpu.vplib import ProgressiveX, ProgressiveXConfig

    vp1 = np.array([2000.0, 240.0])
    vp2 = np.array([320.0, -1500.0])
    segs = []
    for vp in (vp1, vp2):
        for _ in range(30):
            p0 = rng.random(2) * [640, 480]
            d = vp - p0
            d = d / np.linalg.norm(d)
            p1 = p0 + d * (30 + rng.random() * 40)
            segs.append(np.concatenate([p0, p1]))
    segs = np.asarray(segs)
    det = ProgressiveX(ProgressiveXConfig(min_length=10.0,
                                          inlier_threshold=2.0))
    res = det.compute_vp_labels(segs)
    assert res.count_vps() >= 2
    # the two pencils get (mostly) coherent labels
    lab = np.asarray(res.labels)
    first = lab[:30][lab[:30] >= 0]
    second = lab[30:][lab[30:] >= 0]
    assert len(first) > 20 and len(second) > 20
    assert np.bincount(first).max() > 0.9 * len(first)
    assert np.bincount(second).max() > 0.9 * len(second)
