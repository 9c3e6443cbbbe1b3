"""LSD detector via OpenCV (the practical analog of the reference's
pytlsd wrapper, /root/reference/src/limap/line2d/LSD/lsd.py:9-19)."""

from __future__ import annotations

import numpy as np

from limap_tpu.line2d.base import BaseDetector, register_detector


@register_detector("lsd")
class LSDDetector(BaseDetector):
    def __init__(self, options=None):
        super().__init__(options)
        import cv2
        self._lsd = cv2.createLineSegmentDetector(cv2.LSD_REFINE_ADV)

    def get_module_name(self):
        return "lsd"

    def detect(self, camview) -> np.ndarray:
        img = camview.read_image(set_gray=True)
        if img is None:
            return np.zeros((0, 5))
        lines, widths, precs, nfas = self._lsd.detect(img)
        if lines is None:
            return np.zeros((0, 5))
        segs = lines.reshape(-1, 4).astype(np.float64)
        lengths = np.linalg.norm(segs[:, 2:4] - segs[:, :2], axis=1)
        score = np.sqrt(lengths)
        if nfas is not None and len(nfas) == len(segs):
            score = np.sqrt(lengths) * np.abs(nfas.reshape(-1))
        return np.concatenate([segs, score[:, None]], axis=1)

    def detect_array(self, img: np.ndarray) -> np.ndarray:
        """Detect on an in-memory grayscale array."""
        lines, _, _, nfas = self._lsd.detect(img)
        if lines is None:
            return np.zeros((0, 5))
        segs = lines.reshape(-1, 4).astype(np.float64)
        lengths = np.linalg.norm(segs[:, 2:4] - segs[:, :2], axis=1)
        return np.concatenate([segs, np.sqrt(lengths)[:, None]], axis=1)
