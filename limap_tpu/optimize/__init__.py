"""Optimization back-end: batched LM, line BA, refinement, localization."""

from limap_tpu.optimize.lm import (LMResult, lm_solve, retract_pose,
                                   retract_quat_so2)
from limap_tpu.optimize.line_ba import (LineBAConfig, get_output_tracks,
                                        pack_minimal_lines, robust_weight,
                                        solve_line_bundle_adjustment,
                                        unpack_minimal_lines)
from limap_tpu.optimize.line_refinement import (RefinementConfig,
                                                line_refinement,
                                                solve_line_refinement)
from limap_tpu.optimize.hybrid_localization import (LineLocConfig,
                                                    line_loc_residuals,
                                                    solve_jointloc)

__all__ = [
    "LMResult", "lm_solve", "retract_pose", "retract_quat_so2",
    "LineBAConfig", "get_output_tracks", "pack_minimal_lines",
    "robust_weight", "solve_line_bundle_adjustment",
    "unpack_minimal_lines", "RefinementConfig", "line_refinement",
    "solve_line_refinement", "LineLocConfig", "line_loc_residuals",
    "solve_jointloc",
]
