"""Point-map (3D-per-pixel) reader ABC
(reference: src/limap/base/p3d_reader_base.py) — the dense-scan analog
of BaseDepthReader, used by the InLoc fit-from-point-cloud path
(fitting/fitting.py point-map variant)."""

from __future__ import annotations

import numpy as np


class BaseP3DReader:
    def __init__(self, filename: str):
        self.filename = filename

    def read(self, filename: str) -> np.ndarray:
        """-> [H, W, 3] world-space point per pixel (NaN/inf = miss)."""
        raise NotImplementedError

    def read_p3ds(self) -> np.ndarray:
        return self.read(self.filename)


class ArrayP3DReader(BaseP3DReader):
    """In-memory point map (tests / synthetic pipelines)."""

    def __init__(self, p3ds: np.ndarray):
        super().__init__("<array>")
        self._p3ds = np.asarray(p3ds)

    def read(self, filename: str) -> np.ndarray:
        return self._p3ds
