"""Refine a saved line map (reference: runners/refinement.py)."""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from limap_tpu.optimize import line_refinement
from limap_tpu.util import io as limapio
from limap_tpu.util.config import load_config, update_config


def main():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parser = argparse.ArgumentParser(description="refine saved line tracks")
    parser.add_argument("-i", "--input_folder", type=str, required=True,
                        help="finaltracks folder")
    parser.add_argument("-o", "--output_folder", type=str, default=None)
    parser.add_argument("-c", "--config_file", type=str,
                        default=os.path.join(repo_root, "cfgs",
                                             "refinement", "default.yaml"))
    parser.add_argument("--use_vp", action="store_true")
    args, unknown = parser.parse_known_args()

    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {})
    tracks, saved_cfg, imagecols, all_2d_segs = \
        limapio.read_folder_linetracks_with_info(args.input_folder)
    # precedence: saved run config < user config file / CLI overrides
    # (the config stored with the tracks is only a fallback; explicit
    # user settings must win)
    refinement_cfg = dict((saved_cfg or {}).get("refinement", {}))
    refinement_cfg.update(cfg.get("refinement", {}))
    if args.use_vp:
        refinement_cfg["use_vp"] = True
    output_folder = args.output_folder or cfg.get("output_folder",
                                                  "refined_tracks")

    vpresults = None
    if refinement_cfg.get("use_vp") and all_2d_segs is not None:
        from limap_tpu.vplib import get_vp_detector
        vpresults = get_vp_detector(
            refinement_cfg.get("vpdet", {"method": "jlinkage"})) \
            .detect_vp_all_images(all_2d_segs)

    new_tracks = line_refinement(refinement_cfg, tracks, imagecols,
                                 vpresults=vpresults)
    limapio.save_folder_linetracks_with_info(
        output_folder, new_tracks, config=cfg, imagecols=imagecols,
        all_2d_segs=all_2d_segs)
    print(f"refined {len(new_tracks)} tracks -> {output_folder}")


if __name__ == "__main__":
    main()
