"""Config / IO / evaluation utilities."""

from limap_tpu.util import config, evaluation, io

__all__ = ["config", "evaluation", "io"]
