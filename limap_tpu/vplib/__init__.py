"""Vanishing point subsystem."""

from limap_tpu.vplib.jlinkage import JLinkage, JLinkageConfig, VPResult
from limap_tpu.vplib.progressivex import ProgressiveX, ProgressiveXConfig
from limap_tpu.vplib.vptrack import (GlobalVPTrackConstructor,
                                     GlobalVPTrackConstructorConfig, VPTrack,
                                     merge_vptracks_by_direction)


def get_vp_detector(cfg_vpdet: dict, n_jobs: int = 1):
    """register_vp_detector.py equivalent."""
    method = cfg_vpdet.get("method", "jlinkage")
    if method == "jlinkage":
        return JLinkage(JLinkageConfig.from_dict(cfg_vpdet))
    if method == "progressive-x":
        return ProgressiveX(ProgressiveXConfig.from_dict(cfg_vpdet))
    raise NotImplementedError(f"unknown VP detector {method!r}")


__all__ = ["JLinkage", "JLinkageConfig", "ProgressiveX",
           "ProgressiveXConfig", "VPResult", "VPTrack",
           "GlobalVPTrackConstructor", "GlobalVPTrackConstructorConfig",
           "merge_vptracks_by_direction", "get_vp_detector"]
