"""Depth reader ABC (reference: src/limap/base/depth_reader_base.py)."""

from __future__ import annotations

import numpy as np


class BaseDepthReader:
    def __init__(self, filename: str):
        self.filename = filename

    def read(self, filename: str) -> np.ndarray:
        raise NotImplementedError

    def read_depth(self, img_hw=None) -> np.ndarray:
        depth = self.read(self.filename)
        if img_hw is not None and depth.shape != tuple(img_hw):
            import cv2
            depth = cv2.resize(depth, (img_hw[1], img_hw[0]),
                               interpolation=cv2.INTER_NEAREST)
        return depth


class ArrayDepthReader(BaseDepthReader):
    """In-memory depth map (tests / synthetic pipelines)."""

    def __init__(self, depth: np.ndarray):
        super().__init__("<array>")
        self.depth = np.asarray(depth)

    def read(self, filename: str) -> np.ndarray:
        return self.depth
