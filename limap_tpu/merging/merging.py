"""Track building, filtering and remerging — batched over padded tracks.

Re-designs /root/reference/src/limap/merging/merging.cc and
merging_utils.cc.  The reference's union-find strategies reduce to
connected components for its default "greedy" mode (every edge merges
unconditionally once inserted, merging.cc:18-104), which we compute with
the parallel label-propagation kernel in
:mod:`limap_tpu.ops.connected_components`; edge *construction* — the
expensive part — is a single batched linker evaluation instead of nested
OpenMP loops.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base import line_dists as ld
from limap_tpu.base import line_geometry as lg
from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.line_linker import (LineLinker, LineLinker3dConfig,
                                        check_2d, check_3d)
from limap_tpu.base.lines import Segments
from limap_tpu.base.linetrack import (HostTrackBatch, LineTrack, TrackBatch,
                                      batch_from_flat_supports,
                                      batch_to_tracks, tracks_to_batch)
from limap_tpu.merging.aggregator import aggregate_tracks
from limap_tpu.ops.connected_components import (compact_labels,
                                                connected_components)


def set_uncertainty_segs3d(seg3d: Segments, views: CameraViewsBatch,
                           var2d: float = 5.0) -> Segments:
    """Attach per-view uncertainty (merging_utils.cc:15-25), batched."""
    u = lg.compute_uncertainty(seg3d, views, var2d)
    return seg3d._replace(uncertainty=u)


def _expand(segs: Segments, axis: int) -> Segments:
    f = lambda x: None if x is None else jnp.expand_dims(x, axis)
    return Segments(f(segs.start), f(segs.end), f(segs.score),
                    f(segs.depths), f(segs.uncertainty))


# ======================================================================
# Fit&Merge: build tracks from per-image 3D segments
# ======================================================================
def merge_to_linetracks(
        all_lines_2d: Segments,      # fields [I, L, 2]
        all_lines_3d: Segments,      # fields [I, L, 3] (w/ uncertainty)
        line_mask: jnp.ndarray,      # [I, L] valid & nonzero-length
        views: CameraViewsBatch,     # fields [I, ...]
        neighbors: jnp.ndarray,      # [I, K] dense neighbor indices
        neighbor_mask: jnp.ndarray,  # [I, K]
        linker: LineLinker,
        image_ids: Optional[np.ndarray] = None,
        num_outliers: int = 0,
) -> List[LineTrack]:
    """Batched equivalent of MergeToLineTracks (merging.cc:347-511).

    Edge tests run as dense [I, L, L] (self) and [I, K, L, L] (cross)
    linker evaluations; track labels come from parallel connected
    components (== the reference's unconditional greedy union-find).
    """
    cfg3d = linker.linker_3d.to_spatial_merging()
    cfg2d = linker.linker_2d
    I, L = line_mask.shape
    K = neighbors.shape[1]
    if image_ids is None:
        image_ids = np.arange(I)

    @jax.jit
    def build_edges(l2d_s, l2d_e, l3d_s, l3d_e, l3d_u, mask, kvec, qvec,
                    tvec, nbrs, nmask):
        l2d = Segments(l2d_s, l2d_e)
        l3d = Segments(l3d_s, l3d_e, uncertainty=l3d_u)
        vb = CameraViewsBatch(kvec, qvec, tvec)

        # ---- self-image pairs: [I, L, L] (merging.cc:392-416) ----
        a3 = _expand(l3d, 2)   # [I, L, 1]
        b3 = _expand(l3d, 1)   # [I, 1, L]
        ok_self = check_3d(a3, b3, cfg3d)
        ok_self &= check_2d(_expand(l2d, 2), _expand(l2d, 1), cfg2d)
        mm = mask[:, :, None] & mask[:, None, :]
        iu = jnp.triu(jnp.ones((L, L), bool), k=1)
        ok_self &= mm & iu[None]

        # ---- cross-image pairs: [I, K, L, L] (merging.cc:417-464) ----
        ng3 = jax.tree.map(lambda x: None if x is None else x[nbrs], l3d)
        ng3 = Segments(*ng3)
        ng2 = Segments(l2d.start[nbrs], l2d.end[nbrs])
        ng_mask = mask[nbrs] & nmask[:, :, None]
        ng_views = vb.select(nbrs)  # [I, K]

        a3c = _expand(_expand(l3d, 1), 3)        # [I, 1, L, 1]
        b3c = _expand(ng3, 2)                    # [I, K, 1, L]
        ok_cross = check_3d(a3c, b3c, cfg3d)
        # project l1 into neighbor view, test vs neighbor 2D line
        ngv_b = CameraViewsBatch(ng_views.kvec[:, :, None, None],
                                 ng_views.qvec[:, :, None, None],
                                 ng_views.tvec[:, :, None, None])
        proj1 = lg.project_segments(a3c, ngv_b)
        ok_cross &= check_2d(proj1, _expand(ng2, 2), cfg2d)
        # project l2 into own view, test vs own 2D line
        own_b = CameraViewsBatch(kvec[:, None, None, None],
                                 qvec[:, None, None, None],
                                 tvec[:, None, None, None])
        proj2 = lg.project_segments(b3c, own_b)
        ok_cross &= check_2d(proj2, _expand(_expand(l2d, 1), 3), cfg2d)
        ok_cross &= mask[:, None, :, None] & ng_mask[:, :, None, :]
        return ok_self, ok_cross

    ok_self, ok_cross = build_edges(
        all_lines_2d.start, all_lines_2d.end, all_lines_3d.start,
        all_lines_3d.end, all_lines_3d.uncertainty, line_mask,
        views.kvec, views.qvec, views.tvec, neighbors, neighbor_mask)

    # ---- assemble the edge list (host, cheap) ----
    n_nodes = I * L
    es = np.argwhere(np.asarray(ok_self))          # (i, a, b)
    ec = np.argwhere(np.asarray(ok_cross))         # (i, k, a, b)
    nbrs_np = np.asarray(neighbors)
    edges = []
    if len(es):
        edges.append(np.stack([es[:, 0] * L + es[:, 1],
                               es[:, 0] * L + es[:, 2]], axis=1))
    if len(ec):
        edges.append(np.stack(
            [ec[:, 0] * L + ec[:, 2],
             nbrs_np[ec[:, 0], ec[:, 1]] * L + ec[:, 3]], axis=1))
    if edges:
        edges = np.concatenate(edges, axis=0)
    else:
        edges = np.zeros((0, 2), np.int64)

    E_pad = max(int(2 ** np.ceil(np.log2(max(len(edges), 1)))), 1)
    edges_pad = np.zeros((E_pad, 2), np.int32)
    edges_pad[:len(edges)] = edges
    emask = np.arange(E_pad) < len(edges)
    labels = np.asarray(connected_components(
        n_nodes, jnp.asarray(edges_pad), jnp.asarray(emask)))

    # nodes participating in >= 1 edge (tracks need >= 2 supports)
    deg = np.zeros(n_nodes, np.int64)
    np.add.at(deg, edges.reshape(-1), 1)
    valid_node = (deg > 0) & np.asarray(line_mask).reshape(-1)

    return _tracks_from_labels(
        labels, valid_node, I, L, image_ids, all_lines_2d, all_lines_3d,
        views, num_outliers)


def _tracks_from_labels(labels, valid_node, I, L, image_ids, all_lines_2d,
                        all_lines_3d, views, num_outliers) -> List[LineTrack]:
    """Group nodes by component label, aggregate on device, emit tracks."""
    l2s = np.asarray(all_lines_2d.start).reshape(I * L, 2)
    l2e = np.asarray(all_lines_2d.end).reshape(I * L, 2)
    l3s = np.asarray(all_lines_3d.start).reshape(I * L, 3)
    l3e = np.asarray(all_lines_3d.end).reshape(I * L, 3)
    unc = (np.asarray(all_lines_3d.uncertainty).reshape(I * L)
           if all_lines_3d.uncertainty is not None else np.ones(I * L))
    length3d = np.linalg.norm(l3e - l3s, axis=-1)

    node_ids = np.nonzero(valid_node)[0]
    lab = labels[node_ids]
    order = np.argsort(lab, kind="stable")
    node_ids = node_ids[order]
    lab = lab[order]
    # boundaries of groups
    splits = np.nonzero(np.diff(lab))[0] + 1
    groups = np.split(node_ids, splits)
    groups = [g for g in groups if len(g) >= 2]
    if not groups:
        return []

    tracks = []
    for g in groups:
        tr = LineTrack(
            image_id_list=[int(image_ids[n // L]) for n in g],
            line_id_list=[int(n % L) for n in g],
            line2d_list=[np.stack([l2s[n], l2e[n]]) for n in g],
            line3d_list=[np.stack([l3s[n], l3e[n]]) for n in g],
            score_list=[float(length3d[n]) for n in g],
            node_id_list=[int(n) for n in g],
        )
        tracks.append(tr)

    # batched aggregation on device
    id2idx = {int(img): i for i, img in enumerate(image_ids)}
    batch = tracks_to_batch(tracks, id2idx)
    u_pad = np.ones((len(groups), batch.max_supports), np.float32)
    for gi, g in enumerate(groups):
        n = min(len(g), batch.max_supports)
        u_pad[gi, :n] = unc[g[:n]]
    seg3d = batch.line3d._replace(uncertainty=jnp.asarray(u_pad))
    agg = aggregate_tracks(seg3d, batch.score, batch.mask, num_outliers)
    agg_s = np.asarray(agg.start)
    agg_e = np.asarray(agg.end)
    for i, tr in enumerate(tracks):
        tr.line = np.stack([agg_s[i], agg_e[i]])
    return tracks


# ======================================================================
# Track filters (merging_utils.cc)
# ======================================================================
def _support_views(batch: TrackBatch,
                   views: CameraViewsBatch) -> CameraViewsBatch:
    return views.select(batch.img_index)  # fields [T, S, ...]


def _distinct_image_count(img_index, mask):
    big = jnp.int32(2**30)
    ids = jnp.where(mask, img_index, big)
    s = jnp.sort(ids, axis=1)
    diff = jnp.concatenate(
        [jnp.ones_like(s[:, :1], dtype=bool), s[:, 1:] != s[:, :-1]], axis=1)
    return jnp.sum(diff & (s < big), axis=1)


def check_reprojection(batch: TrackBatch, views: CameraViewsBatch,
                       th_angular2d: float, th_perp2d: float) -> jnp.ndarray:
    """Per-support reprojection test (merging_utils.cc:27-49) -> [T, S]."""
    sv = _support_views(batch, views)
    track_line = _expand(batch.line, 1)  # [T, 1, 3]
    proj = lg.project_segments(track_line, sv)  # [T, S, 2]
    ang = ld.angle(batch.line2d, proj)
    perp = ld.dist_endpoints_perpendicular_oneway(batch.line2d, proj)
    return (ang <= th_angular2d) & (perp <= th_perp2d) & batch.mask


def filter_tracks_by_reprojection(batch: TrackBatch, views: CameraViewsBatch,
                                  th_angular2d: float, th_perp2d: float,
                                  num_outliers: int = 2) -> TrackBatch:
    """Drop failing supports + re-aggregate (merging_utils.cc:51-85)."""
    ok = check_reprojection(batch, views, th_angular2d, th_perp2d)
    new_mask = batch.mask & ok
    keep_track = batch.track_mask & (jnp.sum(new_mask, axis=1) > 0)
    agg = aggregate_tracks(batch.line3d, batch.score, new_mask, num_outliers)
    return batch._replace(line=agg, mask=new_mask, track_mask=keep_track)


def check_sensitivity(batch: TrackBatch, views: CameraViewsBatch,
                      th_angular3d: float) -> jnp.ndarray:
    """Per-support sensitivity test (merging_utils.cc:87-104) -> [T, S]."""
    sv = _support_views(batch, views)
    sens = lg.sensitivity(_expand(batch.line, 1), sv)
    return (sens <= th_angular3d) & batch.mask


def filter_tracks_by_sensitivity(batch: TrackBatch, views: CameraViewsBatch,
                                 th_angular3d: float,
                                 min_support_ns: int) -> TrackBatch:
    """Keep tracks with >= N distinct well-conditioned images
    (merging_utils.cc:106-129)."""
    ok = check_sensitivity(batch, views, th_angular3d)
    n_img = _distinct_image_count(batch.img_index, ok)
    return batch._replace(
        track_mask=batch.track_mask & (n_img >= min_support_ns))


def filter_tracks_by_overlap(batch: TrackBatch, views: CameraViewsBatch,
                             th_overlap: float,
                             min_support_ns: int) -> TrackBatch:
    """Keep tracks whose projection overlaps its 2D supports
    (merging_utils.cc:131-155)."""
    sv = _support_views(batch, views)
    proj = lg.project_segments(_expand(batch.line, 1), sv)
    ov = ld.compute_overlap(proj, batch.line2d)
    ok = (ov >= th_overlap) & batch.mask
    n_img = _distinct_image_count(batch.img_index, ok)
    return batch._replace(
        track_mask=batch.track_mask & (n_img >= min_support_ns))


def filter_tracks_by_num_images(batch: TrackBatch,
                                n_visible_views: int) -> TrackBatch:
    return batch._replace(
        track_mask=batch.track_mask
        & (batch.count_images() >= n_visible_views))


# ======================================================================
# Remerge (merging.cc:513-643), iterated to fixpoint
# ======================================================================
import functools


@functools.lru_cache(maxsize=16)
def _build_remerge_check(cfg: LineLinker3dConfig):
    @jax.jit
    def run(line_start, line_end, line3d_start, line3d_end, mask, kvec,
            qvec, tvec):
        sv = CameraViewsBatch(kvec, qvec, tvec)
        u_support = lg.compute_uncertainty(
            Segments(line3d_start, line3d_end), sv)
        u = jnp.min(jnp.where(mask, u_support, 1e30), axis=1)
        line = Segments(line_start, line_end, uncertainty=u)
        T = line_start.shape[0]
        ok = check_3d(_expand(line, 1), _expand(line, 0), cfg)
        # bit-packed result: the [T, T] bool matrix is the dominant
        # D2H of the remerge loop (~15 MB/s tunnel); packed it is T^2/8
        return jnp.packbits(ok & ~jnp.eye(T, dtype=bool), axis=1)

    return run


def _run_remerge_check(check, batch: TrackBatch,
                       sv: CameraViewsBatch) -> np.ndarray:
    T = batch.mask.shape[0]
    packed = np.asarray(check(
        batch.line.start, batch.line.end, batch.line3d.start,
        batch.line3d.end, batch.mask, sv.kvec, sv.qvec, sv.tvec))
    return np.unpackbits(packed, axis=1, count=T).astype(bool)


@functools.lru_cache(maxsize=16)
def _build_remerge_labels(cfg: LineLinker3dConfig):
    """Fused remerge iteration kernel: pairwise linker check AND the
    connected-components labeling run in ONE device call, so only the
    [T] label vector ships back (the bit-packed [T, T/8] matrix plus a
    separate CC dispatch cost two round trips per fixpoint
    iteration)."""
    @jax.jit
    def run(line_start, line_end, line3d_start, line3d_end, mask, kvec,
            qvec, tvec, tmask):
        sv = CameraViewsBatch(kvec, qvec, tvec)
        u_support = lg.compute_uncertainty(
            Segments(line3d_start, line3d_end), sv)
        u = jnp.min(jnp.where(mask, u_support, 1e30), axis=1)
        line = Segments(line_start, line_end, uncertainty=u)
        T = line_start.shape[0]
        ok = check_3d(_expand(line, 1), _expand(line, 0), cfg)
        ok = ok & ~jnp.eye(T, dtype=bool) \
            & tmask[:, None] & tmask[None, :]
        ok = ok | ok.T
        ii = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                              (T, T))
        jj = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :],
                              (T, T))
        edges = jnp.stack([ii.reshape(-1), jj.reshape(-1)], 1)
        labels = connected_components(T, edges, ok.reshape(-1))
        changed = jnp.any(labels != jnp.arange(T, dtype=jnp.int32))
        return labels, changed

    return run


def remerge_once(tracks: List[LineTrack], views: CameraViewsBatch,
                 id2idx: Dict[int, int], cfg3d: LineLinker3dConfig,
                 num_outliers: int = 2) -> List[LineTrack]:
    if len(tracks) <= 1:
        return tracks
    cfg = cfg3d.to_spatial_merging()
    batch = tracks_to_batch(tracks, id2idx)
    sv = _support_views(batch, views)
    T = len(tracks)
    check = _build_remerge_check(cfg)
    # pow-2 shape buckets: every remerge iteration shrinks T, and an
    # unbucketed [T, S] signature would recompile the check kernel per
    # iteration per run (tens of seconds over the TPU tunnel); the
    # padded rows are sliced off after the call
    from limap_tpu.util import shape_bucket
    Tp = shape_bucket(max(T, 2), min_bucket=2)
    S = batch.mask.shape[1]
    Sp = shape_bucket(max(S, 2), min_bucket=2)

    def padTS(a):
        a = np.asarray(a)
        out = np.zeros((Tp, Sp) + a.shape[2:], a.dtype)
        out[:T, :S] = a
        return jnp.asarray(out)

    def padT(a):
        a = np.asarray(a)
        out = np.zeros((Tp,) + a.shape[1:], a.dtype)
        out[:T] = a
        return jnp.asarray(out)

    ok = np.unpackbits(np.asarray(check(
        padT(batch.line.start), padT(batch.line.end),
        padTS(batch.line3d.start), padTS(batch.line3d.end),
        padTS(batch.mask), padTS(sv.kvec), padTS(sv.qvec),
        padTS(sv.tvec))), axis=1, count=Tp)[:T, :T].astype(bool)
    pairs = np.argwhere(np.triu(ok | ok.T, k=1))
    E_pad = max(len(pairs), 1)
    edges = np.zeros((E_pad, 2), np.int32)
    if len(pairs):
        edges[:len(pairs)] = pairs
    emask = np.arange(E_pad) < len(pairs)
    labels = np.asarray(connected_components(
        T, jnp.asarray(edges), jnp.asarray(emask)))

    groups: Dict[int, List[int]] = {}
    for ti in range(T):
        groups.setdefault(int(labels[ti]), []).append(ti)

    new_tracks = []
    for members in groups.values():
        tr = LineTrack()
        for ti in members:
            src = tracks[ti]
            tr.image_id_list += src.image_id_list
            tr.line_id_list += src.line_id_list
            tr.line2d_list += src.line2d_list
            tr.line3d_list += src.line3d_list
            tr.score_list += src.score_list
            tr.node_id_list += src.node_id_list
        new_tracks.append(tr)

    nb = tracks_to_batch(new_tracks, id2idx)
    sv = _support_views(nb, views)
    u_support = lg.compute_uncertainty(nb.line3d, sv)
    seg = nb.line3d._replace(uncertainty=u_support)
    agg = aggregate_tracks(seg, nb.score, nb.mask, num_outliers)
    agg_s, agg_e = np.asarray(agg.start), np.asarray(agg.end)
    for i, tr in enumerate(new_tracks):
        tr.line = np.stack([agg_s[i], agg_e[i]])
    return new_tracks


def remerge(tracks: List[LineTrack], views: CameraViewsBatch,
            id2idx: Dict[int, int], cfg3d: LineLinker3dConfig,
            num_outliers: int = 2, max_iters: int = 10) -> List[LineTrack]:
    """Iterate remerging to fixpoint (merging.py:24-42 in the reference)."""
    num = len(tracks)
    for _ in range(max_iters):
        tracks = remerge_once(tracks, views, id2idx, cfg3d, num_outliers)
        if len(tracks) == num:
            break
        num = len(tracks)
    return tracks


# ======================================================================
# Batch-resident filter/remerge chain: no LineTrack round trips
# ======================================================================
def compact_track_batch(host: HostTrackBatch,
                        labels: Optional[np.ndarray] = None,
                        pow2_buckets: bool = True,
                        return_host: bool = False) -> TrackBatch:
    """Re-pack a host batch dropping masked tracks/supports; when
    ``labels`` is given, tracks with equal label are merged (their
    supports concatenated) — the regroup step of batch remerging.
    Fully vectorized host work + one upload."""
    T = len(host.track_mask)
    if labels is None:
        labels = np.arange(T)
    # compact labels of VALID tracks to 0..T'-1, preserving first-seen
    # order (so no-op compaction keeps track order)
    tvalid = host.track_mask
    lab = np.where(tvalid, labels, -1)
    uniq, inv = np.unique(lab, return_inverse=True)
    # shift so that -1 (invalid) maps to -1
    has_invalid = len(uniq) > 0 and uniq[0] == -1
    new_of = inv - 1 if has_invalid else inv
    n_groups = len(uniq) - (1 if has_invalid else 0)

    # representative line per group = first member's aggregate (only
    # meaningful for labels=None compaction; regrouping re-aggregates)
    tidx = np.nonzero(tvalid)[0]
    first = np.zeros(max(n_groups, 1), np.int64)
    first[new_of[tidx][::-1]] = tidx[::-1]
    line = host.line[first[:n_groups]] if n_groups else None

    ti, si = np.nonzero(host.mask & tvalid[:, None])
    g = new_of[ti]
    order = np.argsort(g, kind="stable")
    ti, si, g = ti[order], si[order], g[order]
    return batch_from_flat_supports(
        g, host.img_index[ti, si], host.image_ids[ti, si],
        host.line_ids[ti, si], host.l2d[ti, si], host.l3d[ti, si],
        host.score[ti, si], line=line, num_tracks=n_groups,
        pow2_buckets=pow2_buckets, return_host=return_host)


def _aggregate_batch(batch: TrackBatch, views: CameraViewsBatch,
                     num_outliers: int) -> TrackBatch:
    """Recompute per-support uncertainty + aggregate endpoints
    (device)."""
    sv = _support_views(batch, views)
    u_support = lg.compute_uncertainty(batch.line3d, sv)
    seg = batch.line3d._replace(uncertainty=u_support)
    agg = aggregate_tracks(seg, batch.score, batch.mask, num_outliers)
    return batch._replace(line=agg)


@functools.lru_cache(maxsize=8)
def _jit_reproj():
    return jax.jit(filter_tracks_by_reprojection, static_argnums=(4,))


@functools.lru_cache(maxsize=8)
def _jit_sens_overlap():
    def run(batch, views, th_angular3d, min_support_sv, th_overlap,
            min_support_ov):
        batch = filter_tracks_by_sensitivity(batch, views, th_angular3d,
                                             min_support_sv)
        return filter_tracks_by_overlap(batch, views, th_overlap,
                                        min_support_ov)
    return jax.jit(run)


def filter_chain_batch(batch: TrackBatch, views: CameraViewsBatch,
                       f2d: dict,
                       remerge_linker3d: Optional[LineLinker3dConfig]
                       = None,
                       num_outliers: int = 2,
                       host: Optional[HostTrackBatch] = None):
    """The runner's whole post-triangulation filter tail
    (line_triangulation.py:171-200 in the reference) on a
    device-resident TrackBatch: reprojection filter -> [remerge
    fixpoint -> reprojection filter] -> sensitivity -> overlap.  Each
    device stage is one jitted call; the only host work is remerge
    regrouping on the ``host`` support mirror.  Returns (batch, host);
    the returned mirror's mask/track_mask may be stale (refresh before
    host-side use)."""
    reproj = _jit_reproj()
    batch = reproj(batch, views, f2d.get("th_angular_2d", 10.0),
                   f2d.get("th_perp_2d", 10.0), num_outliers)
    if remerge_linker3d is not None:
        batch, host = remerge_batch(batch, views, remerge_linker3d,
                                    num_outliers, host=host)
        batch = reproj(batch, views, f2d.get("th_angular_2d", 10.0),
                       f2d.get("th_perp_2d", 10.0), num_outliers)
    batch = _jit_sens_overlap()(
        batch, views, f2d.get("th_sv_angular_3d", 70.0),
        f2d.get("th_sv_num_supports", 3), f2d.get("th_overlap", 0.05),
        f2d.get("th_overlap_num_supports", 3))
    return batch, host


def remerge_batch(batch: TrackBatch, views: CameraViewsBatch,
                  cfg3d: LineLinker3dConfig, num_outliers: int = 2,
                  max_iters: int = 10,
                  host: Optional[HostTrackBatch] = None):
    """Batch-in / batch-out remerge fixpoint: the pairwise linker check
    runs on device (bit-packed [T, T/8] result), the regroup is
    vectorized host numpy on the ``host`` support mirror (the support
    fields never change on device, so no bulk D2H per iteration).  The
    semantics match :func:`remerge` (validated in
    tests/test_batch_chain.py).  Returns (batch, host)."""
    cfg = cfg3d.to_spatial_merging()
    kernel = _build_remerge_labels(cfg)
    host = (host.refresh(batch) if host is not None
            else HostTrackBatch.download(batch))
    n_prev = None
    for _ in range(max_iters):
        T = int(host.track_mask.sum())
        if T <= 1 or (n_prev is not None and T == n_prev):
            break
        n_prev = T
        # ONE device call per iteration (pairwise check + CC fused);
        # padded/invalid tracks are masked inside the kernel and only
        # the [T] label vector ships back over the ~15 MB/s tunnel
        sv = _support_views(batch, views)
        labels, changed = jax.device_get(kernel(
            batch.line.start, batch.line.end, batch.line3d.start,
            batch.line3d.end, batch.mask, sv.kvec, sv.qvec, sv.tvec,
            jnp.asarray(host.track_mask)))
        if not bool(changed):
            break
        batch, host = compact_track_batch(host, np.asarray(labels),
                                          return_host=True)
        batch = _aggregate_batch(batch, views, num_outliers)
        # _aggregate_batch only rewrites the line on device; the mirror
        # stays valid for everything the regroup reads
    return batch, host
