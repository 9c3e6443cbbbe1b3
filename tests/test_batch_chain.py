"""The batch-resident track pipeline (compute_track_batch +
filter_chain_batch/remerge_batch) must produce the SAME tracks as the
legacy LineTrack-list chain (compute_line_tracks + list remerge +
per-call re-batching) — only the data representation differs."""

import numpy as np

from limap_tpu.base.line_linker import LineLinker3dConfig
from limap_tpu.base.linetrack import (HostTrackBatch, LineTrack,
                                      batch_to_tracks, tracks_to_batch)
from limap_tpu.merging import (compact_track_batch, filter_chain_batch,
                               filter_tracks_by_overlap,
                               filter_tracks_by_reprojection,
                               filter_tracks_by_sensitivity, remerge,
                               remerge_batch)
from limap_tpu.triangulation.triangulator import (GlobalLineTriangulator,
                                                  TriangulatorConfig)

from test_triangulator import build_scene, perfect_matches


def _track_key(tr):
    return tuple(sorted(zip(tr.image_id_list, tr.line_id_list)))


def _track_map(tracks):
    return {_track_key(t): t for t in tracks if t.count_lines() > 0}


def _run_triangulator(rng, n_views=6, n_lines=12):
    imagecols, gt, segs = build_scene(rng, n_views, n_lines)
    # duplicate detections so remerge has real work: each GT line is
    # detected twice (slightly shifted), producing split tracks
    segs2 = {}
    for k, arr in segs.items():
        arr2 = arr.copy()
        arr2[:, 0::2] += 0.35
        segs2[k] = np.concatenate([arr, arr2], 0)
    m = np.stack([np.arange(n_lines), np.arange(n_lines)], axis=1)
    m2 = m + n_lines
    matches = {i: {j: np.concatenate([m, m2], 0)
                   for j in range(n_views) if j != i}
               for i in range(n_views)}
    cfg = TriangulatorConfig(fullscore_th=0.5, max_tris_per_node=16)
    tri = GlobalLineTriangulator(cfg)
    tri.init(segs2, imagecols)
    tri.triangulate_all(matches)
    return tri, imagecols


def test_compute_track_batch_matches_list_path(rng):
    tri, imagecols = _run_triangulator(rng)
    list_tracks = tri.compute_line_tracks()
    batch = tri.compute_track_batch()
    batch_tracks = batch_to_tracks(batch)

    assert len(batch_tracks) == len(list_tracks) > 0
    lm, bm = _track_map(list_tracks), _track_map(batch_tracks)
    assert set(lm) == set(bm)
    for key in lm:
        np.testing.assert_allclose(bm[key].line, lm[key].line,
                                   atol=1e-4)
        np.testing.assert_allclose(
            sorted(bm[key].score_list), sorted(lm[key].score_list),
            atol=1e-4)


def test_filter_chain_batch_matches_list_chain(rng):
    tri, imagecols = _run_triangulator(rng)
    views = imagecols.batch()
    id2row = imagecols.img_id_to_index()
    f2d = {"th_angular_2d": 5.0, "th_perp_2d": 4.0,
           "th_sv_angular_3d": 75.0, "th_sv_num_supports": 3,
           "th_overlap": 0.05, "th_overlap_num_supports": 3}
    linker3d = LineLinker3dConfig()

    # ---- legacy list chain (the runner's old flow) ----
    def filter_reproj(tracks):
        if not tracks:
            return tracks
        tb = tracks_to_batch(tracks, id2row)
        tb = filter_tracks_by_reprojection(
            tb, views, f2d["th_angular_2d"], f2d["th_perp_2d"])
        return [t for t in batch_to_tracks(tb) if t.count_lines() > 0]

    lt = filter_reproj(tri.compute_line_tracks())
    lt = remerge(lt, views, id2row, linker3d)
    lt = filter_reproj(lt)
    tb = tracks_to_batch(lt, id2row)
    tb = filter_tracks_by_sensitivity(
        tb, views, f2d["th_sv_angular_3d"], f2d["th_sv_num_supports"])
    tb = filter_tracks_by_overlap(
        tb, views, f2d["th_overlap"], f2d["th_overlap_num_supports"])
    list_final = [t for t in batch_to_tracks(tb) if t.count_lines() > 0]

    # ---- batch-resident chain (with host support mirror) ----
    batch, host = tri.compute_track_batch(return_host=True)
    batch, host = filter_chain_batch(batch, views, f2d, linker3d,
                                     host=host)
    batch_final = [t for t in batch_to_tracks(batch, host=host)
                   if t.count_lines() > 0]

    lm, bm = _track_map(list_final), _track_map(batch_final)
    assert len(lm) > 0
    assert set(lm) == set(bm)
    for key in lm:
        np.testing.assert_allclose(bm[key].line, lm[key].line,
                                   atol=1e-3)


def test_compact_track_batch_drops_dead(rng):
    tri, imagecols = _run_triangulator(rng)
    batch = tri.compute_track_batch()
    host = HostTrackBatch.download(batch)
    n_valid = int(host.track_mask.sum())
    # kill one track + one support and compact
    tm = host.track_mask.copy()
    first = np.nonzero(tm)[0][0]
    tm[first] = False
    host = host._replace(track_mask=tm)
    compacted = compact_track_batch(host)
    assert int(np.asarray(compacted.track_mask).sum()) == n_valid - 1
    # supports survive verbatim for kept tracks
    a = _track_map(batch_to_tracks(batch))
    b = _track_map(batch_to_tracks(compacted))
    assert len(set(a) - set(b)) == 1
    assert set(b).issubset(set(a))


def test_remerge_batch_matches_list_remerge(rng):
    tri, imagecols = _run_triangulator(rng)
    views = imagecols.batch()
    id2row = imagecols.img_id_to_index()
    linker3d = LineLinker3dConfig()
    tracks = tri.compute_line_tracks()
    list_merged = remerge(tracks, views, id2row, linker3d)

    batch = tri.compute_track_batch()
    merged, mhost = remerge_batch(batch, views, linker3d)
    batch_merged = [t for t in batch_to_tracks(merged, host=mhost)
                    if t.count_lines() > 0]
    lm, bm = _track_map(list_merged), _track_map(batch_merged)
    assert set(lm) == set(bm)
    for key in lm:
        np.testing.assert_allclose(bm[key].line, lm[key].line, atol=1e-3)
