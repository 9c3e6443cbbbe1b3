"""Generic hybrid localization entry point.

Covers the reference's per-dataset localization mains
(runners/7scenes/localization.py, runners/cambridge, runners/inloc) for
any scene expressed as: a db COLMAP model + a saved line map + per-query
point correspondences (npz) + a retrieval file.

Inputs the reference obtains from hloc are taken as files here:
  --point_corresp: npz with arrays p3ds_<qid>, p2ds_<qid>
  --retrieval: txt "query_img_id db_img_id db_img_id ..." per line
"""

import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from limap_tpu.pointsfm import ReadInfos
from limap_tpu.runners import hybrid_localization
from limap_tpu.util import io as limapio
from limap_tpu.util.config import load_config, update_config


def main():
    parser = argparse.ArgumentParser(description="hybrid PnPL localization")
    parser.add_argument("-c", "--config_file", type=str,
                        default="cfgs/localization/default.yaml")
    parser.add_argument("--db_model", type=str, required=True,
                        help="COLMAP model of database images")
    parser.add_argument("--query_model", type=str, required=True,
                        help="COLMAP model holding query cameras (poses "
                             "optional, used as priors)")
    parser.add_argument("--linemap", type=str, required=True,
                        help="finaltracks folder of the db line map")
    parser.add_argument("--point_corresp", type=str, required=True)
    parser.add_argument("--retrieval", type=str, required=True)
    parser.add_argument("--results_path", type=str,
                        default="localization_results.txt")
    args, unknown = parser.parse_known_args()
    cfg = load_config(args.config_file)
    cfg = update_config(cfg, unknown, {})
    cfg.setdefault("output_dir", "tmp_localization")

    imagecols_db = ReadInfos(args.db_model)
    imagecols_query = ReadInfos(args.query_model)
    linemap, _, _, _ = limapio.read_folder_linetracks_with_info(args.linemap)

    data = np.load(args.point_corresp)
    point_corresp = {}
    for key in data.files:
        if key.startswith("p3ds_"):
            qid = int(key[5:])
            point_corresp[qid] = (data[key], data[f"p2ds_{qid}"])

    retrieval = {}
    with open(args.retrieval) as f:
        for line in f:
            tok = line.split()
            if tok:
                retrieval[int(tok[0])] = [int(v) for v in tok[1:]]

    poses = hybrid_localization(cfg, imagecols_db, imagecols_query,
                                point_corresp, linemap, retrieval,
                                results_path=args.results_path)
    print(f"localized {len(poses)} queries -> {args.results_path}")


if __name__ == "__main__":
    main()
