"""Visualize a saved line map (reference: visualize_3d_lines.py)."""

import argparse

from limap_tpu.util import io as limapio
from limap_tpu.visualize import (BaseTrackVisualizer,
                                 get_track_visualizer)


def main():
    parser = argparse.ArgumentParser(description="visualize 3d lines")
    parser.add_argument("-i", "--input_dir", type=str, required=True,
                        help="finaltracks folder or .obj file")
    parser.add_argument("-nv", "--n_visible_views", type=int, default=4)
    parser.add_argument("--save_obj", type=str, default=None)
    args = parser.parse_args()

    if args.input_dir.endswith(".obj"):
        lines = limapio.load_obj(args.input_dir)
        print(f"loaded {len(lines)} lines")
        return
    tracks = limapio.read_folder_linetracks(args.input_dir)
    vis = get_track_visualizer(tracks)
    vis.report()
    if args.save_obj:
        vis.save_obj(args.save_obj, args.n_visible_views)
        print(f"wrote {args.save_obj}")
    elif type(vis) is BaseTrackVisualizer:
        print("no 3D backend (open3d/pyvista) available; "
              "use --save_obj for offline viewing")
    else:
        vis.vis_all_lines(n_visible_views=args.n_visible_views)


if __name__ == "__main__":
    main()
