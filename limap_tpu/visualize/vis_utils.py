"""2D drawing helpers (reference: src/limap/visualize/vis_utils.py)."""

from __future__ import annotations

import numpy as np


def draw_segments(img: np.ndarray, segs: np.ndarray,
                  color=(0, 255, 0), thickness: int = 1) -> np.ndarray:
    import cv2
    out = img.copy()
    if out.ndim == 2:
        out = cv2.cvtColor(out, cv2.COLOR_GRAY2BGR)
    for s in np.asarray(segs):
        p1 = tuple(np.round(s[:2]).astype(int))
        p2 = tuple(np.round(s[2:4]).astype(int))
        cv2.line(out, p1, p2, color, thickness)
    return out


def draw_points(img: np.ndarray, points: np.ndarray,
                color=(0, 0, 255), radius: int = 2) -> np.ndarray:
    import cv2
    out = img.copy()
    if out.ndim == 2:
        out = cv2.cvtColor(out, cv2.COLOR_GRAY2BGR)
    for p in np.asarray(points):
        cv2.circle(out, tuple(np.round(p[:2]).astype(int)), radius, color,
                   -1)
    return out


def draw_matches(img1: np.ndarray, segs1: np.ndarray, img2: np.ndarray,
                 segs2: np.ndarray, matches: np.ndarray) -> np.ndarray:
    """Side-by-side match visualization."""
    import cv2
    h = max(img1.shape[0], img2.shape[0])
    w = img1.shape[1] + img2.shape[1]

    def to_bgr(im):
        return cv2.cvtColor(im, cv2.COLOR_GRAY2BGR) if im.ndim == 2 else im

    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[:img1.shape[0], :img1.shape[1]] = to_bgr(img1)
    canvas[:img2.shape[0], img1.shape[1]:] = to_bgr(img2)
    off = img1.shape[1]
    rng = np.random.default_rng(0)
    for a, b in np.asarray(matches).reshape(-1, 2):
        color = tuple(int(c) for c in rng.integers(64, 255, 3))
        s1 = segs1[int(a)]
        s2 = segs2[int(b)]
        cv2.line(canvas, tuple(np.round(s1[:2]).astype(int)),
                 tuple(np.round(s1[2:4]).astype(int)), color, 2)
        cv2.line(canvas,
                 tuple((np.round(s2[:2]) + [off, 0]).astype(int)),
                 tuple((np.round(s2[2:4]) + [off, 0]).astype(int)), color, 2)
        m1 = 0.5 * (s1[:2] + s1[2:4])
        m2 = 0.5 * (s2[:2] + s2[2:4]) + [off, 0]
        cv2.line(canvas, tuple(np.round(m1).astype(int)),
                 tuple(np.round(m2).astype(int)), color, 1)
    return canvas
