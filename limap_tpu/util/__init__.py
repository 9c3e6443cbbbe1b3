"""Config / IO / evaluation utilities."""

from limap_tpu.util import config, evaluation, io

__all__ = ["config", "evaluation", "io", "shape_bucket"]

def shape_bucket(n: int, fine: int = 128, min_bucket: int = 8) -> int:
    """Static-shape bucket for n: powers of two up to ``fine``, then
    multiples of ``fine``.  Pow2 everywhere wastes up to 2x compute and
    tunnel bytes at protocol scale (561 lines -> 1024); multiples of
    128 (a full lane tile) keep XLA-friendly shapes with <= 128/n
    waste while still bounding the number of distinct compiled shapes.
    """
    import numpy as np
    n = max(int(n), 1)
    if n <= fine:
        return max(int(2 ** np.ceil(np.log2(max(n, min_bucket)))),
                   min_bucket)
    return fine * ((n + fine - 1) // fine)
