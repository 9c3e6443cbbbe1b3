"""Batched line linkers: thresholded connection tests + exp-decay scores.

Re-implements LineLinker2d / LineLinker3d / LineLinker of the reference
(/root/reference/src/limap/base/line_linker.h:55,140,167 and
line_linker.cc) as pure functions over batched :class:`Segments`.  Every
check/score broadcasts, so a full ``[N, M]`` affinity matrix costs one
vectorized evaluation instead of N*M virtual calls.

Configs keep the reference's default thresholds (they encode the paper's
tuning, line_linker.h:23-46 for 2D and :85-111 for 3D) and the three 3D
mode presets (line_linker.h:115-137).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp

from limap_tpu.base import line_dists as ld
from limap_tpu.base.lines import Segments


def expscore(val, sigma):
    """exp(-(val/sigma)^2 / 2) (line_linker.cc:15-17)."""
    return jnp.exp(-((val / sigma) ** 2) / 2.0)


def _multiplier(score_th: float) -> float:
    """exp(-(v/sigma)^2/2) >= th  <=>  v <= sigma/multiplier
    (line_linker.cc:9-12)."""
    return 1.0 / math.sqrt(-math.log(score_th) * 2.0)


@dataclasses.dataclass(frozen=True)
class LineLinker2dConfig:
    score_th: float = 0.5
    th_angle: float = 8.0
    use_angle: bool = True
    th_overlap: float = 0.1
    use_overlap: bool = True
    th_smartoverlap: float = 0.2
    th_smartangle: float = 1.0
    use_smartangle: bool = True
    th_perp: float = 5.0       # pixels
    use_perp: bool = True
    th_innerseg: float = 5.0   # pixels
    use_innerseg: bool = False

    @property
    def multiplier(self) -> float:
        return _multiplier(self.score_th)

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "LineLinker2dConfig":
        if d is None:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


@dataclasses.dataclass(frozen=True)
class LineLinker3dConfig:
    score_th: float = 0.5
    th_angle: float = 10.0
    use_angle: bool = True
    th_overlap: float = 0.01
    use_overlap: bool = True
    th_smartoverlap: float = 0.1
    th_smartangle: float = 1.0
    use_smartangle: bool = True
    th_perp: float = 0.02
    use_perp: bool = False
    th_innerseg: float = 0.02
    use_innerseg: bool = True
    th_scaleinv: float = 0.01
    use_scaleinv: bool = False

    @property
    def multiplier(self) -> float:
        return _multiplier(self.score_th)

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "LineLinker3dConfig":
        if d is None:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    # mode presets (line_linker.h:115-137)
    def to_shared_parent_scoring(self) -> "LineLinker3dConfig":
        return dataclasses.replace(self, use_angle=True, use_overlap=False,
                                   use_perp=False, use_innerseg=False,
                                   use_scaleinv=True)

    def to_spatial_merging(self) -> "LineLinker3dConfig":
        return dataclasses.replace(self, use_angle=True, use_overlap=True,
                                   use_perp=False, use_innerseg=True,
                                   use_scaleinv=False)

    def to_avgtest_merging(self) -> "LineLinker3dConfig":
        return dataclasses.replace(self, use_angle=True, use_overlap=False,
                                   use_perp=True, use_innerseg=False,
                                   use_scaleinv=False)


def _gated(score, score_th):
    """Zero out scores below the threshold (the reference's pattern)."""
    return jnp.where(score < score_th, 0.0, score)


def _smartangle_score(l1, l2, cfg):
    """Angle score with overlap-adaptive sigma (line_linker.cc:49-65)."""
    ang = ld.angle(l1, l2)
    overlap = ld.compute_bioverlap(l1, l2)
    ratio = jnp.minimum(
        (cfg.th_smartoverlap - overlap)
        / (cfg.th_smartoverlap - cfg.th_overlap), 1.0)
    th_adapt = cfg.th_angle - ratio * (cfg.th_angle - cfg.th_smartangle)
    th = jnp.where(overlap < cfg.th_smartoverlap, th_adapt, cfg.th_angle)
    return _gated(expscore(ang, th * cfg.multiplier), cfg.score_th)


def _min_uncertainty(l1: Segments, l2: Segments):
    if l1.uncertainty is None or l2.uncertainty is None:
        return 1.0
    return jnp.minimum(l1.uncertainty, l2.uncertainty)


def score_2d(l1: Segments, l2: Segments, cfg: LineLinker2dConfig):
    """Joint 2D linker score (line_linker.cc:139-160), broadcasting."""
    score = jnp.ones(jnp.broadcast_shapes(l1.start.shape[:-1],
                                          l2.start.shape[:-1]))
    if cfg.use_angle:
        s = _gated(expscore(ld.angle(l1, l2),
                            cfg.th_angle * cfg.multiplier), cfg.score_th)
        score = jnp.minimum(score, s)
    if cfg.use_overlap:
        s = jnp.where(ld.compute_bioverlap(l1, l2) > cfg.th_overlap, 1.0, 0.0)
        score = jnp.minimum(score, s)
    if cfg.use_angle and cfg.use_overlap and cfg.use_smartangle:
        score = jnp.minimum(score, _smartangle_score(l1, l2, cfg))
    if cfg.use_perp:
        s = _gated(expscore(ld.dist_endpoints_perpendicular(l1, l2),
                            cfg.th_perp * cfg.multiplier), cfg.score_th)
        score = jnp.minimum(score, s)
    if cfg.use_innerseg:
        s = _gated(expscore(ld.dist_innerseg(l1, l2),
                            cfg.th_innerseg * cfg.multiplier), cfg.score_th)
        score = jnp.minimum(score, s)
    return score


def check_2d(l1: Segments, l2: Segments, cfg: LineLinker2dConfig):
    """Joint 2D connection test (line_linker.cc:120-137), broadcasting.

    Note the reference's angle *check* uses the raw threshold rather than
    the gated score, so this is not simply ``score_2d > 0``.
    """
    ok = jnp.ones(jnp.broadcast_shapes(l1.start.shape[:-1],
                                       l2.start.shape[:-1]), dtype=bool)
    if cfg.use_angle:
        ok &= ld.angle(l1, l2) <= cfg.th_angle
    if cfg.use_overlap:
        ok &= ld.compute_bioverlap(l1, l2) > cfg.th_overlap
    if cfg.use_angle and cfg.use_overlap and cfg.use_smartangle:
        ok &= _smartangle_score(l1, l2, cfg) >= cfg.score_th
    if cfg.use_perp:
        s = expscore(ld.dist_endpoints_perpendicular(l1, l2),
                     cfg.th_perp * cfg.multiplier)
        ok &= s >= cfg.score_th
    if cfg.use_innerseg:
        s = expscore(ld.dist_innerseg(l1, l2),
                     cfg.th_innerseg * cfg.multiplier)
        ok &= s >= cfg.score_th
    return ok


def score_3d(l1: Segments, l2: Segments, cfg: LineLinker3dConfig):
    """Joint 3D linker score (line_linker.cc:306-331), broadcasting.

    The perp/innerseg sigmas are scaled by min(uncertainty) as in the
    reference (line_linker.cc:240-258).
    """
    score = jnp.ones(jnp.broadcast_shapes(l1.start.shape[:-1],
                                          l2.start.shape[:-1]))
    if cfg.use_angle:
        s = _gated(expscore(ld.angle(l1, l2),
                            cfg.th_angle * cfg.multiplier), cfg.score_th)
        score = jnp.minimum(score, s)
    if cfg.use_overlap:
        s = jnp.where(ld.compute_bioverlap(l1, l2) > cfg.th_overlap, 1.0, 0.0)
        score = jnp.minimum(score, s)
    if cfg.use_angle and cfg.use_overlap and cfg.use_smartangle:
        score = jnp.minimum(score, _smartangle_score(l1, l2, cfg))
    if cfg.use_perp:
        u = _min_uncertainty(l1, l2)
        s = _gated(expscore(ld.dist_endpoints_perpendicular(l1, l2),
                            cfg.th_perp * u * cfg.multiplier), cfg.score_th)
        score = jnp.minimum(score, s)
    if cfg.use_innerseg:
        u = _min_uncertainty(l1, l2)
        s = _gated(expscore(ld.dist_innerseg(l1, l2),
                            cfg.th_innerseg * u * cfg.multiplier), cfg.score_th)
        score = jnp.minimum(score, s)
    if cfg.use_scaleinv:
        s = _gated(expscore(ld.dist_endpoints_scaleinv_oneway(l1, l2),
                            cfg.th_scaleinv * cfg.multiplier), cfg.score_th)
        score = jnp.minimum(score, s)
    return score


def check_3d(l1: Segments, l2: Segments, cfg: LineLinker3dConfig):
    """Joint 3D connection test (line_linker.cc:284-304), broadcasting."""
    ok = jnp.ones(jnp.broadcast_shapes(l1.start.shape[:-1],
                                       l2.start.shape[:-1]), dtype=bool)
    if cfg.use_angle:
        ok &= ld.angle(l1, l2) <= cfg.th_angle
    if cfg.use_overlap:
        ok &= ld.compute_bioverlap(l1, l2) > cfg.th_overlap
    if cfg.use_angle and cfg.use_overlap and cfg.use_smartangle:
        ok &= _smartangle_score(l1, l2, cfg) >= cfg.score_th
    if cfg.use_perp:
        u = _min_uncertainty(l1, l2)
        s = expscore(ld.dist_endpoints_perpendicular(l1, l2),
                     cfg.th_perp * u * cfg.multiplier)
        ok &= s >= cfg.score_th
    if cfg.use_innerseg:
        u = _min_uncertainty(l1, l2)
        s = expscore(ld.dist_innerseg(l1, l2),
                     cfg.th_innerseg * u * cfg.multiplier)
        ok &= s >= cfg.score_th
    if cfg.use_scaleinv:
        s = expscore(ld.dist_endpoints_scaleinv_oneway(l1, l2),
                     cfg.th_scaleinv * cfg.multiplier)
        ok &= s >= cfg.score_th
    return ok


@dataclasses.dataclass(frozen=True)
class LineLinker:
    """Joint 2D+3D linker (line_linker.h:167-197)."""

    linker_2d: LineLinker2dConfig = LineLinker2dConfig()
    linker_3d: LineLinker3dConfig = LineLinker3dConfig()

    @classmethod
    def from_dicts(cls, d2d=None, d3d=None) -> "LineLinker":
        return cls(LineLinker2dConfig.from_dict(d2d),
                   LineLinker3dConfig.from_dict(d3d))

    def score_2d(self, l1, l2):
        return score_2d(l1, l2, self.linker_2d)

    def check_2d(self, l1, l2):
        return check_2d(l1, l2, self.linker_2d)

    def score_3d(self, l1, l2):
        return score_3d(l1, l2, self.linker_3d)

    def check_3d(self, l1, l2):
        return check_3d(l1, l2, self.linker_3d)
