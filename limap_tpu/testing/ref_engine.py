"""Host bridge to the C++ reference-semantics baseline engine.

Builds limap_tpu/cpp/ref_engine.cpp on demand, serializes a scene
(views + 2D segments + matches) into its binary format, runs it, and
parses the JSON result.  Used by bench.py to anchor ``vs_baseline``
against a real native CPU engine with the reference's architecture
(per-object loops + OpenMP), and by tests to cross-check the C++
engine against the f64 NumPy oracle (reference_oracle.py).
"""

from __future__ import annotations

import json
import os
import struct
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "cpp", "ref_engine.cpp")
_BIN = os.path.join(_HERE, "..", "cpp", "ref_engine")


def build(verbose: bool = False) -> str:
    """Compile the baseline engine (g++ -O3 -fopenmp).

    Cached by a content hash of the source (stored next to the binary),
    never by mtime: a checked-out or copied stale binary would otherwise
    be accepted and silently skew the benchmark baseline."""
    import hashlib

    src = os.path.abspath(_SRC)
    out = os.path.abspath(_BIN)
    stamp = out + ".srchash"
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    if os.path.exists(out) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == digest:
                return out
    cmd = [os.environ.get("CXX", "g++"), "-O3", "-march=native", "-fopenmp",
           "-std=c++17", src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=not verbose)
    with open(stamp, "w") as f:
        f.write(digest)
    return out


def write_scene(path, views, segs, matches, cfg=None):
    """Serialize a scene to the engine's binary format.

    views: {img_id: (K [3,3], R [3,3], t [3])}
    segs: {img_id: [L, 4] float (x1, y1, x2, y2)}
    matches: {img_id: {ng_img_id: [M, 2] int}}
    cfg: optional TriangulatorConfig-like object whose scalar thresholds
        and linker2d/linker3d settings override the engine's built-in
        reference defaults (so TPU and CPU runs share one config).
    """
    with open(path, "wb") as f:
        if cfg is not None:
            f.write(struct.pack("<i", -2))
            l2, l3 = cfg.linker2d, cfg.linker3d
            vals = [cfg.min_length_2d, cfg.line_tri_angle_threshold,
                    cfg.IoU_threshold, cfg.sensitivity_threshold, cfg.var2d,
                    cfg.fullscore_th, float(cfg.max_valid_conns),
                    float(cfg.min_num_outer_edges),
                    float(cfg.num_outliers_aggregator),
                    l2.th_angle, l2.th_overlap, l2.th_smartoverlap,
                    l2.th_smartangle, l2.th_perp,
                    l3.th_angle, l3.th_overlap, l3.th_smartoverlap,
                    l3.th_smartangle, l3.th_perp, l3.th_innerseg,
                    l3.th_scaleinv]
            np.asarray(vals, "<f8").tofile(f)
        f.write(struct.pack("<i", len(views)))
        for img_id in sorted(views):
            K, R, t = views[img_id]
            f.write(struct.pack("<i", int(img_id)))
            np.asarray(K, "<f8").tofile(f)
            np.asarray(R, "<f8").tofile(f)
            np.asarray(t, "<f8").tofile(f)
            arr = np.asarray(segs[img_id], "<f8")
            if arr.ndim == 2 and arr.shape[1] > 4:
                arr = arr[:, :4]  # drop score column (detector output)
            arr = np.ascontiguousarray(arr.reshape(-1, 4), "<f8")
            f.write(struct.pack("<i", len(arr)))
            arr.tofile(f)
        blocks = [(i, j, np.asarray(m, "<i4").reshape(-1, 2))
                  for i, nbrs in matches.items() for j, m in nbrs.items()]
        f.write(struct.pack("<i", len(blocks)))
        for i, j, m in blocks:
            f.write(struct.pack("<iii", int(i), int(j), len(m)))
            m.tofile(f)


def run(views, segs, matches, repeats: int = 1,
        dump_tracks: bool = False, cfg=None) -> dict:
    """Run the C++ baseline engine on a scene; returns its JSON stats.

    With dump_tracks, the result dict gains "tracks": a list of support
    lists [(img_id, line_id), ...], one per track.
    """
    binary = build()
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as tmp:
        scene_path = tmp.name
    dump_path = scene_path + ".tracks"
    try:
        write_scene(scene_path, views, segs, matches, cfg=cfg)
        cmd = [binary, scene_path, str(repeats)]
        if dump_tracks:
            cmd.append(dump_path)
        out = subprocess.run(cmd, check=True, capture_output=True, text=True)
        result = json.loads(out.stdout.strip())
        if dump_tracks:
            tracks = {}
            with open(dump_path) as f:
                for row in f:
                    t, img, line = map(int, row.split())
                    tracks.setdefault(t, []).append((img, line))
            result["tracks"] = [tracks[t] for t in sorted(tracks)]
        return result
    finally:
        os.unlink(scene_path)
        if os.path.exists(dump_path):
            os.unlink(dump_path)
