"""Global multi-view line triangulator — batched proposal + scoring engine.

Re-designs /root/reference/src/limap/triangulation/base_line_triangulator.cc
and global_line_triangulator.cc.  Differences by design:

- Per-image processing keeps the reference's incremental structure
  (TriangulateImage per image), but inside an image everything is one
  fixed-shape kernel: all (line, match) pairs triangulate at once
  ([E] proposals), and the O(tris^2) scoring runs as a single
  ``[L, T, T]`` masked linker evaluation instead of nested OpenMP loops
  (global_line_triangulator.cc:71-161).
- The per-image support cap ("each image contributes only once",
  :83-112) is a segment-max over neighbor slots.
- Track building: valid-edge graph -> parallel connected components
  (equivalent to the reference's default greedy strategy, see
  limap_tpu.ops.connected_components) -> batched aggregation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from limap_tpu.base import line_dists as ld
from limap_tpu.base import line_geometry as lgeo
from limap_tpu.base.camera import CameraViewsBatch
from limap_tpu.base.image_collection import ImageCollection
from limap_tpu.base.line_linker import (LineLinker, LineLinker2dConfig,
                                        LineLinker3dConfig, score_2d,
                                        score_3d)
from limap_tpu.base.lines import Segments
from limap_tpu.base.linetrack import LineTrack, tracks_to_batch
from limap_tpu.merging.aggregator import aggregate_tracks
from limap_tpu.ops.connected_components import connected_components
from limap_tpu.triangulation import functions as trifun


# compiled-kernel cache shared across triangulator instances (keyed by
# every static parameter the kernel closures capture); the runners
# create one instance per scene and a per-instance cache would force a
# full recompile per pipeline run (tens of seconds over the TPU tunnel)
_KERNEL_CACHE: dict = {}


@dataclasses.dataclass(frozen=True)
class TriangulatorConfig:
    """BaseLineTriangulatorConfig + GlobalLineTriangulatorConfig
    (base_line_triangulator.h:20-43, global_line_triangulator.h:13-23),
    defaults from cfgs/triangulation/default.yaml."""

    add_halfpix: bool = False
    use_vp: bool = False
    use_endpoints_triangulation: bool = False
    disable_many_points_triangulation: bool = False
    disable_one_point_triangulation: bool = False
    disable_algebraic_triangulation: bool = False
    disable_vp_triangulation: bool = False
    min_length_2d: float = 0.0
    line_tri_angle_threshold: float = 1.0
    IoU_threshold: float = 0.1
    sensitivity_threshold: float = 70.0
    var2d: float = 2.0
    fullscore_th: float = 1.0
    max_valid_conns: int = 1000
    min_num_outer_edges: int = 0
    merging_strategy: str = "greedy"
    num_outliers_aggregator: int = 2
    # padding buckets
    max_tris_per_node: int = 64
    # Linker defaults follow cfgs/triangulation/default.yaml:85-99 (the
    # tuning the reference always loads), not the C++ class defaults.
    linker2d: LineLinker2dConfig = dataclasses.field(
        default_factory=lambda: LineLinker2dConfig(
            th_angle=5.0, th_perp=2.0, th_overlap=0.05))
    linker3d: LineLinker3dConfig = dataclasses.field(
        default_factory=lambda: LineLinker3dConfig(
            th_angle=10.0, th_overlap=0.05, th_smartoverlap=0.1,
            th_smartangle=2.0, th_perp=1.0, th_innerseg=1.0,
            th_scaleinv=0.015))

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "TriangulatorConfig":
        if d is None:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in fields
              and k not in ("linker2d", "linker3d")}
        if "linker2d_config" in d:
            kw["linker2d"] = LineLinker2dConfig.from_dict(d["linker2d_config"])
        if "linker3d_config" in d:
            kw["linker3d"] = LineLinker3dConfig.from_dict(d["linker3d_config"])
        return cls(**kw)


class GlobalLineTriangulator:
    """Image-incremental triangulator with batched kernels.

    Usage mirrors the reference (line_triangulation.py:102-168):
      tri = GlobalLineTriangulator(cfg)
      tri.init(all_2d_segs, imagecols); tri.set_ranges(ranges)
      for img_id: tri.triangulate_image(img_id, matches[img_id])
      tracks = tri.compute_line_tracks()
    """

    def __init__(self, cfg: TriangulatorConfig = TriangulatorConfig()):
        self.cfg = cfg
        self.ranges = None
        self.vpresults = None

    # ------------------------------------------------------------ setup
    def init(self, all_2d_segs: Dict[int, np.ndarray],
             imagecols: ImageCollection) -> None:
        assert imagecols.IsUndistorted(), "undistort images first"
        self.imagecols = imagecols
        self.img_ids = imagecols.get_img_ids()
        self.id2idx = imagecols.img_id_to_index()
        self.views = imagecols.batch()
        I = len(self.img_ids)

        from limap_tpu.util import shape_bucket
        L = max((len(all_2d_segs[i]) for i in self.img_ids), default=1)
        L = shape_bucket(L)
        self.L = L
        lines = np.zeros((I, L, 4), np.float32)
        mask = np.zeros((I, L), bool)
        for row, img_id in enumerate(self.img_ids):
            segs = np.asarray(all_2d_segs[img_id], np.float32)
            n = len(segs)
            if n:
                lines[row, :n] = segs[:, :4]
                mask[row, :n] = True
        if self.cfg.add_halfpix:
            lines[mask] += 0.5
        self.lines2d = Segments(jnp.asarray(lines[..., :2]),
                                jnp.asarray(lines[..., 2:4]))
        self.line_mask = jnp.asarray(mask)
        lengths = np.linalg.norm(lines[..., 2:4] - lines[..., :2], axis=-1)
        self.line_ok = jnp.asarray(mask
                                   & (lengths > self.cfg.min_length_2d))
        # packed per-line row [sx, sy, ex, ey, ok, pad]: neighbor
        # lookups become ONE wide gather instead of three scalar
        # gathers (XLA TPU gathers run ~100M elements/s; at protocol
        # scale the separate gathers were ~30% of device time)
        packed = np.zeros((I, L, 6), np.float32)
        packed[..., :4] = lines[..., :4]
        packed[..., 4] = (mask & (lengths > self.cfg.min_length_2d))
        self._l2d_packed = jnp.asarray(packed)
        # packed per-view row [kvec(4), qvec(4), tvec(3), pad]
        vb = self.views
        camp = np.zeros((I, 12), np.float32)
        camp[:, 0:4] = np.asarray(vb.kvec)
        camp[:, 4:8] = np.asarray(vb.qvec)
        camp[:, 8:11] = np.asarray(vb.tvec)
        self._cam_packed = jnp.asarray(camp)

        # per-node state filled during triangulation
        self.best_line3d = np.zeros((I, L, 2, 3), np.float32)
        self.best_depths = np.zeros((I, L, 2), np.float32)
        self.best_unc = np.full((I, L), 1e30, np.float32)
        self.best_score = np.full((I, L), -1.0, np.float32)
        self.valid_edge_ng = np.full(
            (I, L, self.cfg.max_tris_per_node), -1, np.int32)  # global node
        self.valid_edge_cnt = np.zeros((I, L), np.int32)
        self._dev_results = None
        self._host_synced = True

    def set_ranges(self, ranges) -> None:
        if ranges is not None:
            self.ranges = (jnp.asarray(ranges[0], jnp.float32),
                           jnp.asarray(ranges[1], jnp.float32))

    def init_vp_results(self, vpresults: Dict[int, "object"]) -> None:
        """vpresults: {img_id: VPResult} with per-line labels + vps."""
        I, L = len(self.img_ids), self.L
        vp = np.zeros((I, L, 3), np.float32)
        has = np.zeros((I, L), bool)
        for row, img_id in enumerate(self.img_ids):
            res = vpresults.get(img_id) if hasattr(vpresults, "get") \
                else vpresults[img_id]
            if res is None:
                continue
            labels = np.asarray(res.labels)
            vps = np.asarray(res.vps)
            n = min(len(labels), L)
            sel = labels[:n] >= 0
            has[row, :n] = sel
            vp[row, :n][sel] = vps[labels[:n][sel]]
        self.vpresults = (jnp.asarray(vp), jnp.asarray(has))


    # ------------------------------------------------- bucketed kernels
    def _bucket_kernel(self, K: int, T: int):
        """Flat whole-group triangulation kernel (proposals + scoring +
        selection) over host-bucketed candidate edges.

        Design notes (TPU):
        - Host-side bucketing places each line's candidate match edges
          into up to T dense slots of a ``[G, L, T]`` layout before
          upload, so the device does NO grouping at all — the previous
          design's on-device argsort + scatter grouping and its vmapped
          gathers lowered to serialized custom calls costing 5-25 ms
          per op on TPU (profiled in-env); the flat equivalents run at
          full HBM rate.
        - Everything is flat ``[G*L, ...]`` instead of vmapped, with
          explicit flat-index gathers (``arr.reshape(NM)[i]``), which
          XLA lowers to fast dynamic-gathers.
        - The O(tris^2) scoring (global_line_triangulator.cc:71-161)
          runs as one ``[G*L, TT, TT]`` masked linker evaluation; the
          per-neighbor-image support cap (:83-112) is an unrolled
          per-slot masked max (a scatter-max serializes on TPU).
        """
        cfg = self.cfg
        L = self.L
        linker3d_scoring = cfg.linker3d.to_shared_parent_scoring()

        def run(l2d_packed, cam_packed, words1d, meta1d, vp_data,
                ranges_lo, ranges_hi):
            # words1d [G * L * T]: packed edge words, uint16 fast path
            # ((b << 5) | slot, 0xFFFF = empty; halves the host->device
            # bytes — the dominant cost on the remote tunnel) when
            # L <= 2048 and K <= 31 (slot 31 never occurs, so the max
            # real word (2047 << 5) | 30 = 65534 < the 0xFFFF
            # sentinel), else int32 ((b << 7) | slot, -1 = empty).  meta1d [G * (K + 1)] int32: neighbor row
            # table + row id per image.  Uploaded as flat 1-D
            # arrays; the tunnel link runs at ~40-50 MB/s H2D
            # (measured r5), so halving bytes via the uint16 packing
            # below is worth ~115 ms per protocol-scale pass.
            G = words1d.shape[0] // (L * T)
            N = G * L
            I = cam_packed.shape[0]
            l2d_flat = l2d_packed.reshape(I * L, 6)
            meta = meta1d.reshape(G, K + 1)
            nbr_table = meta[:, :K]                             # [G, K]
            row_ids = meta[:, K]                                # [G]

            word = words1d.reshape(N, T)
            if word.dtype == jnp.uint16:
                tvalid = word != jnp.uint16(0xFFFF)
                w = jnp.where(tvalid, word, 0).astype(jnp.int32)
                b = w >> 5
                slot = w & 0x1F
            else:
                tvalid = word >= 0
                w = jnp.maximum(word, 0)
                b = w >> 7
                slot = w & 0x7F

            rowf = jnp.repeat(row_ids, L)                       # [N]
            a_ids = jnp.tile(jnp.arange(L, dtype=jnp.int32), G)
            g_ids = jnp.repeat(jnp.arange(G, dtype=jnp.int32), L)
            ng_row = nbr_table.reshape(G * K)[
                g_ids[:, None] * K + jnp.clip(slot, 0, K - 1)]
            ng_row = jnp.maximum(ng_row, 0)                     # [N, T]

            idx1 = rowf * L + a_ids                             # [N]
            idx2 = ng_row * L + b                               # [N, T]
            # self rows: contiguous row-takes; neighbors: ONE wide gather
            own = jnp.take(l2d_packed, row_ids, axis=0).reshape(N, 6)
            nb = l2d_flat[idx2]                                 # [N, T, 6]
            cam1 = jnp.take(cam_packed, row_ids, axis=0)        # [G, 12]
            cam1 = jnp.repeat(cam1, L, axis=0)[:, None, :]      # [N, 1, 12]
            cam2 = cam_packed[ng_row]                           # [N, T, 12]
            l1 = Segments(own[:, None, 0:2], own[:, None, 2:4])
            l2 = Segments(nb[..., 0:2], nb[..., 2:4])
            v1 = CameraViewsBatch(cam1[..., 0:4], cam1[..., 4:8],
                                  cam1[..., 8:11])              # [N, 1]
            v2 = CameraViewsBatch(cam2[..., 0:4], cam2[..., 4:8],
                                  cam2[..., 8:11])              # [N, T]
            valid = tvalid & (own[:, None, 4] > 0.5) & (nb[..., 4] > 0.5)

            banks = []   # (tri Segments [N, T], ok [N, T])
            if not cfg.disable_algebraic_triangulation:
                # degeneracy: ray-plane angles
                # (base_line_triangulator.cc:291-302)
                n2 = trifun.get_normal_direction(l2, v2)
                ray_s = v1.ray_direction(l1.start)
                ray_e = v1.ray_direction(l1.end)
                ang_s = 90.0 - jnp.degrees(jnp.arccos(jnp.clip(
                    jnp.abs(jnp.sum(n2 * ray_s, -1)), 0, 1)))
                ang_e = 90.0 - jnp.degrees(jnp.arccos(jnp.clip(
                    jnp.abs(jnp.sum(n2 * ray_e, -1)), 0, 1)))
                ok = ((ang_s >= cfg.line_tri_angle_threshold)
                      & (ang_e >= cfg.line_tri_angle_threshold))
                iou = trifun.compute_epipolar_iou(l1, v1, l2, v2)
                ok &= iou >= cfg.IoU_threshold
                if cfg.use_endpoints_triangulation:
                    tri = trifun.triangulate_line_by_endpoints(l1, v1,
                                                               l2, v2)
                else:
                    tri = trifun.triangulate_line_algebraic(l1, v1, l2, v2)
                # sensitivity cull (:315-317)
                s1 = lgeo.sensitivity(tri, v1)
                s2 = lgeo.sensitivity(tri, v2)
                ok &= ~((s1 > cfg.sensitivity_threshold)
                        & (s2 > cfg.sensitivity_threshold))
                banks.append((tri, ok & valid))
            if cfg.use_vp and not cfg.disable_vp_triangulation \
                    and vp_data is not None:
                vp, has_vp = vp_data
                vpf = vp.reshape(I * L, 3)
                hasf = has_vp.reshape(I * L)
                # both VP proposals use view1's frame
                # (base_line_triangulator.cc:259-288)
                for idx_arr in (jnp.broadcast_to(idx1[:, None], (N, T)),
                                idx2):
                    direc = trifun.get_direction_from_vp(vpf[idx_arr], v1)
                    tri = trifun.triangulate_line_with_direction(
                        l1, v1, l2, v2, direc)
                    banks.append((tri, valid & hasf[idx_arr]))

            def finalize(tri, ok):
                ok = ok & (tri.score > 0)
                if ranges_lo is not None:
                    ok &= trifun.test_line_inside_ranges(
                        tri, (ranges_lo, ranges_hi))
                u1 = lgeo.compute_uncertainty(tri, v1, cfg.var2d)
                u2 = lgeo.compute_uncertainty(tri, v2, cfg.var2d)
                return tri._replace(uncertainty=jnp.minimum(u1, u2)), ok

            outs = [finalize(t, o) for (t, o) in banks]
            B = len(outs)
            TT = B * T
            cat1 = lambda xs: xs[0] if B == 1 else jnp.concatenate(xs, 1)
            tri_start = cat1([t.start for t, _ in outs])
            tri_end = cat1([t.end for t, _ in outs])
            tri_depths = cat1([t.depths for t, _ in outs])
            tri_unc = cat1([t.uncertainty for t, _ in outs])
            tri_ok = cat1([o for _, o in outs])
            tile2 = lambda x: x if B == 1 else jnp.tile(x, (1, B))
            tile3 = lambda x: x if B == 1 else jnp.tile(x, (1, B, 1))
            slot_all = tile2(slot)
            ng_all = tile2(ng_row)
            b_all = tile2(b)
            l2s_all, l2e_all = tile3(l2.start), tile3(l2.end)
            kv2, qv2, tv2 = tile3(v2.kvec), tile3(v2.qvec), tile3(v2.tvec)

            # ---- scoring: [TT, TT, N] pairwise min(3D, 2D) linker ----
            # N (tens of thousands) is the MINOR dimension: fp32 tiles
            # are (8, 128), so a [N, TT, TT] layout with TT=24/32 lanes
            # pads every row to 128 (4-5x wasted VPU lanes + VMEM
            # traffic); with N minor every tile is fully packed.
            tS = jnp.transpose(tri_start, (1, 0, 2))    # [TT, N, 3]
            tE = jnp.transpose(tri_end, (1, 0, 2))
            tD = jnp.transpose(tri_depths, (1, 0, 2))
            tU = tri_unc.T                               # [TT, N]
            tOK = tri_ok.T
            slotT = slot_all.T                           # [TT, N]
            l_i = Segments(tS[:, None], tE[:, None], depths=tD[:, None],
                           uncertainty=tU[:, None])      # [TT, 1, N]
            l_j = Segments(tS[None], tE[None], depths=tD[None],
                           uncertainty=tU[None])         # [1, TT, N]
            s3d = score_3d(l_i, l_j, linker3d_scoring)   # [TT, TT, N]
            # 2D: project tri_i into tri_j's neighbor view, compare with
            # tri_j's matched 2D segment (global_line_triangulator.cc:100-102)
            vj = CameraViewsBatch(
                jnp.transpose(kv2, (1, 0, 2))[None],
                jnp.transpose(qv2, (1, 0, 2))[None],
                jnp.transpose(tv2, (1, 0, 2))[None])     # [1, TT, N]
            proj = lgeo.project_segments(
                Segments(tS[:, None], tE[:, None]), vj)
            s2d = score_2d(
                proj,
                Segments(jnp.transpose(l2s_all, (1, 0, 2))[None],
                         jnp.transpose(l2e_all, (1, 0, 2))[None]),
                cfg.linker2d)
            s = jnp.minimum(s3d, s2d)
            # i == j pairs share a slot, so the slot test also excludes
            # the diagonal
            pair_ok = (tOK[:, None] & tOK[None]
                       & (slotT[:, None] != slotT[None]))
            s = jnp.where(pair_ok, s, 0.0)
            # one support per neighbor image: per-slot masked max,
            # summed over the K static slots (cc:109-112)
            slot_j = slotT[None]                         # [1, TT, N]
            scoresT = jnp.zeros((TT, N), s.dtype)
            for k in range(K):
                scoresT = scoresT + jnp.max(
                    jnp.where(slot_j == k, s, 0.0), axis=1)
            scores = jnp.where(tri_ok, scoresT.T, -1.0)  # [N, TT]

            # ---- best tri + valid edges (cc:118-153) ----
            r = jnp.arange(N, dtype=jnp.int32)
            best = jnp.argmax(scores, axis=1).astype(jnp.int32)
            gidx = r * TT + best
            has_any = tri_ok.reshape(N * TT)[gidx]
            best_start = tri_start.reshape(N * TT, 3)[gidx]
            best_end = tri_end.reshape(N * TT, 3)[gidx]
            best_depths = tri_depths.reshape(N * TT, 2)[gidx]
            best_unc = jnp.where(has_any,
                                 tri_unc.reshape(N * TT)[gidx], 1e30)
            best_score = jnp.where(has_any,
                                   scores.reshape(N * TT)[gidx], -1.0)

            valid_e = tri_ok & (scores >= cfg.fullscore_th)
            if cfg.max_valid_conns < TT:
                # top-max_valid_conns by score; a no-op when the tri
                # bucket is below the cap (default cap is 1000)
                rank = jnp.argsort(jnp.argsort(-scores, axis=1), axis=1)
                valid_e &= rank < cfg.max_valid_conns
            ng_global = ng_all * L + b_all
            cnt = jnp.minimum(jnp.sum(valid_e, axis=1), T)
            pack_order = jnp.argsort(~valid_e, axis=1, stable=True)
            pidx = (r[:, None] * TT + pack_order[:, :T]).reshape(-1)
            packed = ng_global.reshape(N * TT)[pidx].reshape(N, T)
            padded = jnp.where(jnp.arange(T, dtype=jnp.int32)[None, :]
                               < cnt[:, None], packed, -1)

            floats = jnp.concatenate(
                [best_start, best_end, best_depths, best_unc[:, None],
                 best_score[:, None]], axis=1).reshape(G, L, 10)
            ints = jnp.concatenate(
                [padded, cnt[:, None].astype(jnp.int32)],
                axis=1).reshape(G, L, T + 1)
            return floats, ints

        return run

    def _get_bucket_kernel(self, K: int, T: int):
        # MODULE-level cache: a fresh triangulator instance (one per
        # scene in the runners) must reuse the compiled kernel — a
        # per-instance cache re-jits on every pipeline invocation,
        # which costs tens of seconds per compile over the TPU tunnel
        key = ("bucket", K, T, self.L, repr(self.cfg),
               self.vpresults is not None)
        if key not in _KERNEL_CACHE:
            _KERNEL_CACHE[key] = jax.jit(self._bucket_kernel(K, T))
        return _KERNEL_CACHE[key]

    def triangulate_all_mesh(self, matches_by_image, mesh,
                             axis: str = None) -> None:
        """Data-parallel triangulation over a ``jax.sharding.Mesh``:
        images are sharded across devices (each device triangulates +
        scores its shard with zero communication — the stage is
        embarrassingly parallel until clustering, SURVEY §2.3).  The
        mesh must have a single axis; ``axis`` defaults to that axis's
        own name so any 1-D mesh (e.g. parallel.mesh.make_mesh or
        parallel.distributed.global_mesh) works unmodified."""
        if axis is None:
            names = list(mesh.shape.keys())
            if len(names) != 1:
                raise ValueError(
                    f"triangulate_all_mesh needs a 1-D mesh, got axes "
                    f"{names}; pass axis= explicitly")
            axis = names[0]
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        rows, matches_list = [], []
        for img_id in self.img_ids:
            m = matches_by_image.get(img_id)
            if m is None:
                continue
            rows.append(self.id2idx[img_id])
            matches_list.append(m)
        if not rows:
            return
        words, meta, K, Tc, overflow = self._bucket_arrays(rows,
                                                           matches_list)
        self.overflow_edges = overflow
        n = len(rows)
        d = int(np.prod([mesh.shape[a] for a in mesh.shape]))
        pad_n = (-n) % d
        if pad_n:
            words = np.concatenate([words,
                                    np.repeat(words[-1:], pad_n, 0)])
            meta = np.concatenate([meta, np.repeat(meta[-1:], pad_n, 0)])
        run = self._bucket_kernel(K, Tc)
        lo = self.ranges[0] if self.ranges is not None else None
        hi = self.ranges[1] if self.ranges is not None else None
        l2dp, camp = self._l2d_packed, self._cam_packed
        vp = self.vpresults

        def shard_fn(words2d, meta2d):
            return run(l2dp, camp, words2d.reshape(-1),
                       meta2d.reshape(-1), vp, lo, hi)

        sharded = jax.jit(shard_map(
            shard_fn, mesh=mesh, in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis)), check_vma=False))
        floats, ints = sharded(jnp.asarray(words), jnp.asarray(meta))
        self._dev_results = (rows, [(list(range(n)), floats[:n],
                                     ints[:n])], Tc)
        self._host_synced = False
        jax.block_until_ready(floats)

    def _gather_edges(self, rows: List[int], matches_list: List[dict]):
        """Per-image candidate-edge key/val arrays (slot-major, stable)
        plus the global slot count K and bucket width Tc — the cheap
        first half of bucketing, separated so the expensive per-group
        dense fill can be prefetched while earlier groups upload."""
        T = self.cfg.max_tris_per_node
        L = self.L
        K = max((len(m) for m in matches_list), default=1) or 1
        assert K <= 127, "slot encoding uses 7 bits"
        per_key, per_val, nbr_rows = [], [], []
        max_count = 1
        for matches in matches_list:
            neighbors = sorted(matches.keys())
            nbr_rows.append([self.id2idx[ng] for ng in neighbors])
            kk, vv = [], []
            for s_i, ng in enumerate(neighbors):
                m = np.asarray(matches[ng]).reshape(-1, 2)
                if not len(m):
                    continue
                kk.append(m[:, 0].astype(np.int64))
                vv.append((m[:, 1].astype(np.int32) << 7) | s_i)
            if kk:
                k = np.concatenate(kk)
                per_key.append(k)
                per_val.append(np.concatenate(vv))
                max_count = max(max_count,
                                int(np.bincount(k, minlength=L).max()))
            else:
                per_key.append(np.zeros(0, np.int64))
                per_val.append(np.zeros(0, np.int32))
        # effective bucket width: cover of the actual max edges/line,
        # capped at max_tris_per_node — upload bytes scale with Tc and
        # scoring compute with Tc^2, so the cover is the next multiple
        # of 8 (2/4 for tiny scenes) rather than the next power of two
        # (20 edges/line -> Tc 24, not 32: 1.8x less pair work);
        # bucketing stays coarse enough to bound recompilation
        if max_count <= 2:
            Tc = 2
        elif max_count <= 4:
            Tc = 4
        else:
            Tc = int(8 * ((max_count + 7) // 8))
        Tc = min(T, Tc)
        return per_key, per_val, nbr_rows, K, Tc

    def _fill_group(self, per_key, per_val, nbr_rows, rows, g0, g1,
                    K, Tc):
        """Dense [g, L, Tc] edge-word fill for images [g0, g1) — the
        native single-pass stable bucket + uint16 re-encode + meta."""
        L = self.L
        g = g1 - g0
        kk = [per_key[i] + (i - g0) * L for i in range(g0, g1)]
        key = np.concatenate(kk) if kk else np.zeros(0, np.int64)
        vals = np.concatenate(per_val[g0:g1]) if g else \
            np.zeros(0, np.int32)
        from limap_tpu.ops import hostops
        words, overflow = hostops.bucket_scene(key, vals, g * L, Tc)
        words = words.reshape(g, L * Tc)
        if L <= 2048 and K <= 31:
            # uint16 re-encode ((b << 5) | slot, 0xFFFF = empty):
            # halves the dominant host->device transfer.  With K <= 31
            # slot 31 never occurs, so the sentinel cannot collide even
            # at b = L-1 = 2047.
            w16 = ((words >> 7) << 5 | (words & 0x7F)).astype(np.uint16)
            words = np.where(words < 0, np.uint16(0xFFFF), w16)
        meta = np.full((g, K + 1), -1, np.int32)
        for i in range(g0, g1):
            nr = nbr_rows[i]
            meta[i - g0, :len(nr)] = nr
            meta[i - g0, K] = rows[i]
        return words, meta, overflow

    def _bucket_arrays(self, rows: List[int], matches_list: List[dict]):
        """Host-side bucketing: per-line candidate edges, slot-major
        stable order, dense [n, L, T] slots.  Edges beyond the T bucket
        are dropped and counted (``overflow``) — the reference has no
        such cap (global_line_triangulator.h:17 caps valid *edges* at
        1000, not proposals), so a non-zero overflow means
        ``max_tris_per_node`` should be raised for this scene."""
        per_key, per_val, nbr_rows, K, Tc = self._gather_edges(
            rows, matches_list)
        words, meta, overflow = self._fill_group(
            per_key, per_val, nbr_rows, rows, 0, len(rows), K, Tc)
        return words, meta, K, Tc, overflow

    # ----------------------------------------------------- triangulation
    def triangulate_image(self, img_id: int,
                          matches: Dict[int, np.ndarray]) -> None:
        """Triangulate + score all lines of one image against its
        matched neighbors (TriangulateImage + ScoringCallback).
        Synchronous: writes host state for this image directly."""
        self._sync_host()
        row = self.id2idx[img_id]
        words, meta, K, Tc, overflow = self._bucket_arrays([row], [matches])
        self.overflow_edges = getattr(self, "overflow_edges", 0) + overflow
        kern = self._get_bucket_kernel(K, Tc)
        lo = self.ranges[0] if self.ranges is not None else None
        hi = self.ranges[1] if self.ranges is not None else None
        floats, ints = kern(
            self._l2d_packed, self._cam_packed,
            jnp.asarray(words.reshape(-1)), jnp.asarray(meta.reshape(-1)),
            self.vpresults, lo, hi)
        floats = np.asarray(floats)[0]
        ints = np.asarray(ints)[0]
        self.best_line3d[row, :, 0] = floats[:, 0:3]
        self.best_line3d[row, :, 1] = floats[:, 3:6]
        self.best_depths[row] = floats[:, 6:8]
        self.best_unc[row] = floats[:, 8]
        self.best_score[row] = floats[:, 9]
        self.valid_edge_ng[row] = -1
        self.valid_edge_ng[row, :, :Tc] = ints[:, :Tc]
        self.valid_edge_cnt[row] = ints[:, Tc]

    def triangulate_image_exhaustive(self, img_id: int,
                                     neighbors: List[int]) -> None:
        """All-pairs matching variant (TriangulateImageExhaustiveMatch),
        expressed as a dense match table into the bucketed path."""
        row = self.id2idx[img_id]
        n_lines = int(np.asarray(jnp.sum(self.line_mask[row])))
        matches = {}
        for ng in neighbors:
            ng_row = self.id2idx[ng]
            n_ng = int(np.asarray(jnp.sum(self.line_mask[ng_row])))
            aa, bb2 = np.meshgrid(np.arange(n_lines), np.arange(n_ng),
                                  indexing="ij")
            matches[ng] = np.stack([aa.reshape(-1), bb2.reshape(-1)], 1)
        self.triangulate_image(img_id, matches)

    def triangulate_all(self, matches_by_image: Dict[int, Dict[int,
                                                               np.ndarray]],
                        group_size: Optional[int] = None) -> None:
        """Triangulate + score every image, ``group_size`` images per
        device call (the batched fast path used by the runner).

        All device calls are dispatched asynchronously and the results
        stay ON DEVICE (``self._dev_results``); host-side state arrays
        are synchronized lazily on first access (:meth:`_sync_host`).
        On a remote-tunnel TPU backend a single deferred download of
        the packed results replaces hundreds of per-image round trips
        (26 ms RTT per synchronization measured in-env)."""
        import time as _time
        from concurrent.futures import ThreadPoolExecutor
        t_start = _time.perf_counter()
        rows, matches_list = [], []
        for img_id in self.img_ids:
            m = matches_by_image.get(img_id)
            if m is None:
                continue
            rows.append(self.id2idx[img_id])
            matches_list.append(m)
        if not rows:
            return
        per_key, per_val, nbr_rows, K, Tc = self._gather_edges(
            rows, matches_list)
        t_bucket = _time.perf_counter()
        kern = self._get_bucket_kernel(K, Tc)
        lo = self.ranges[0] if self.ranges is not None else None
        hi = self.ranges[1] if self.ranges is not None else None

        n = len(rows)
        if group_size is None:
            # as many images per dispatch as ~2 GB of [L, TT, TT]
            # scoring intermediates allow (fewer dispatches = less
            # per-call overhead on the remote tunnel), then EQUALIZED
            # over the resulting group count: padding the last group
            # to a full-size one shipped + computed up to ~40% phantom
            # images (100 imgs at cap 47 padded to 3x47 = 141)
            per_img = self.L * (Tc * Tc) * 4 * 12
            group_size = int(max(1, min(n, 2e9 // max(per_img, 1))))
            n_groups = -(-n // group_size)
            group_size = -(-n // n_groups)
        pad_n = (-n) % group_size
        for _ in range(pad_n):
            # pad to a whole number of groups with the last image
            per_key.append(per_key[n - 1])
            per_val.append(per_val[n - 1])
            nbr_rows.append(nbr_rows[n - 1])
            rows.append(rows[n - 1])
        n_pad = n + pad_n

        # three-stage pipeline: the prefetch thread densifies group
        # g+1's edge words (native bucket + uint16 encode, GIL-free)
        # while group g's host->device transfer streams and group g-1
        # computes — at protocol scale the serial version spent
        # bucket 88 ms + upload 165 ms + compute in sequence
        overflow = 0
        upload_bytes = 0
        outs = []
        groups = [(g0, min(g0 + group_size, n_pad))
                  for g0 in range(0, n_pad, group_size)]
        with ThreadPoolExecutor(max_workers=1) as ex:
            futs = [ex.submit(self._fill_group, per_key, per_val,
                              nbr_rows, rows, g0, g1, K, Tc)
                    for g0, g1 in groups]
            for (g0, g1), fut in zip(groups, futs):
                words, meta, ovf = fut.result()
                overflow += ovf
                upload_bytes += words.nbytes + meta.nbytes
                d_words = jax.device_put(np.ascontiguousarray(
                    words).reshape(-1))
                d_meta = jax.device_put(np.ascontiguousarray(
                    meta).reshape(-1))
                floats, ints = kern(self._l2d_packed, self._cam_packed,
                                    d_words, d_meta, self.vpresults,
                                    lo, hi)
                outs.append((list(range(g0, min(g1, n))), floats, ints))
        rows = rows[:n]
        self.overflow_edges = overflow
        if overflow:
            import warnings
            warnings.warn(
                f"{overflow} candidate edges dropped by the "
                f"max_tris_per_node={self.cfg.max_tris_per_node} bucket; "
                f"raise it for full recall", stacklevel=2)
        self._dev_results = (rows, outs, Tc)
        self._host_synced = False
        t_dispatch = _time.perf_counter()
        jax.block_until_ready([o[1] for o in outs])
        t_end = _time.perf_counter()
        # per-stage attribution measured INSIDE the pass: parts sum to
        # the pass total by construction (bench.py consumes this).
        # bucket fill / upload / device compute are all pipelined, so
        # they are attributed together (= dispatch-loop time + final
        # wait); bucket_s is the serial edge-gather prefix only.
        self.timings = {
            "bucket_s": t_bucket - t_start,
            "upload_s": 0.0,
            "dispatch_s": t_dispatch - t_bucket,
            "device_s": t_end - t_dispatch,
            "total_s": t_end - t_start,
            "upload_bytes": int(upload_bytes),
            "Tc": Tc,
        }

    def _sync_host(self) -> None:
        """Download device-resident triangulation results into the host
        state arrays (one transfer per group, once per scene)."""
        if getattr(self, "_host_synced", True):
            return
        self._host_synced = True
        img_rows, outs, Tc = self._dev_results
        for idxs, floats, ints in outs:
            floats = np.asarray(floats)
            ints = np.asarray(ints)
            for gi, oi in enumerate(idxs):
                row = img_rows[oi]
                self.best_line3d[row, :, 0] = floats[gi, :, 0:3]
                self.best_line3d[row, :, 1] = floats[gi, :, 3:6]
                self.best_depths[row] = floats[gi, :, 6:8]
                self.best_unc[row] = floats[gi, :, 8]
                self.best_score[row] = floats[gi, :, 9]
                self.valid_edge_ng[row] = -1
                self.valid_edge_ng[row, :, :Tc] = ints[gi, :, :Tc]
                self.valid_edge_cnt[row] = ints[gi, :, Tc]


    # ------------------------------------------------------ track build
    def _filter_by_num_outer_edges(self) -> np.ndarray:
        """Iterative degree filter (global_line_triangulator.cc:168-232)."""
        self._sync_host()
        I = len(self.img_ids)
        L = self.L
        flags = np.ones((I, L), bool)
        if self.cfg.min_num_outer_edges <= 0:
            return flags
        counters = self.valid_edge_cnt.copy()
        # reverse adjacency
        src = np.repeat(np.arange(I * L).reshape(I, L)[..., None],
                        self.cfg.max_tris_per_node, axis=-1)
        dst = self.valid_edge_ng
        ok = dst >= 0
        rev: Dict[int, List[int]] = {}
        for s, d in zip(src[ok], dst[ok]):
            rev.setdefault(int(d), []).append(int(s))
        from collections import deque
        q = deque()
        flags_flat = flags.reshape(-1)
        cnt_flat = counters.reshape(-1)
        for n in range(I * L):
            if cnt_flat[n] < self.cfg.min_num_outer_edges:
                flags_flat[n] = False
                q.append(n)
        while q:
            n = q.popleft()
            for p in rev.get(n, ()):
                if not flags_flat[p]:
                    continue
                cnt_flat[p] -= 1
                if cnt_flat[p] < self.cfg.min_num_outer_edges:
                    flags_flat[p] = False
                    q.append(p)
        return flags_flat.reshape(I, L)

    def _cluster_labels_device(self):
        """Device fast path for run_clustering: edge gating (3D linker
        on best tris) + connected components run ON DEVICE from the
        still-resident triangulation outputs; only per-node labels +
        the float table ship to the host (the [I, L, Tc+1] edge table —
        the dominant D2H at ~15 MB/s tunnel bandwidth — never leaves).
        Semantics identical to the host path (tests/test_batch_chain.py
        exercises both).  Returns the same tuple as _cluster_labels."""
        I, L = len(self.img_ids), self.L
        img_rows, outs, Tc = self._dev_results
        cfg3d_cluster = self.cfg.linker3d.to_spatial_merging()

        key = ("cluster_dev", I, L, Tc, repr(cfg3d_cluster))
        if key not in _KERNEL_CACHE:
            def cluster(floats_all, ints_all):
                N = I * L
                f = floats_all.reshape(N, 10)
                dst = ints_all.reshape(N, Tc + 1)[:, :Tc]
                valid = dst >= 0
                d = jnp.maximum(dst, 0)
                src = jnp.broadcast_to(
                    jnp.arange(N, dtype=jnp.int32)[:, None], (N, Tc))
                # score the SORTED pair like the host path's unique
                # undirected edge list (score_3d is not exactly
                # symmetric under uncertainty scaling).  Node fields
                # gather as TWO wide [.., 10] row-gathers — fourteen
                # separate scalar gathers over 1.5M indices were the
                # bulk of this kernel's 0.46 s
                lo = jnp.minimum(src, d)
                hi = jnp.maximum(src, d)
                flo = f[lo]                    # [N, Tc, 10]
                fhi = f[hi]
                l1 = Segments(flo[..., 0:3], flo[..., 3:6],
                              uncertainty=flo[..., 8])
                l2 = Segments(fhi[..., 0:3], fhi[..., 3:6],
                              uncertainty=fhi[..., 8])
                escore = score_3d(l1, l2, cfg3d_cluster)
                keep = valid & (escore > 0) & (flo[..., 9] > 0) \
                    & (fhi[..., 9] > 0)
                edges = jnp.stack([src.reshape(-1),
                                   d.astype(jnp.int32).reshape(-1)], 1)
                labels = connected_components(N, edges, keep.reshape(-1))
                keep_f = keep.reshape(-1)
                has_edge = (jnp.zeros(N, bool)
                            .at[lo.reshape(-1)].max(keep_f)
                            .at[hi.reshape(-1)].max(keep_f))
                return labels, has_edge

            _KERNEL_CACHE[key] = jax.jit(cluster)

        # scatter group results into full [I, L, ...] tables on device
        floats_all = jnp.zeros((I, L, 10), jnp.float32)
        ints_all = jnp.full((I, L, Tc + 1), -1, jnp.int32)
        for idxs, floats, ints in outs:
            rsub = jnp.asarray([img_rows[oi] for oi in idxs], jnp.int32)
            g = len(idxs)
            floats_all = floats_all.at[rsub].set(floats[:g])
            ints_all = ints_all.at[rsub].set(ints[:g])
        labels_d, has_edge_d = _KERNEL_CACHE[key](floats_all, ints_all)
        labels, has_edge, floats_np = jax.device_get(
            [labels_d, has_edge_d, floats_all])
        f = floats_np.reshape(I * L, 10)
        # keep the float-valued host state arrays in sync for the rows
        # that were actually triangulated (the int edge tables stay
        # device-only on this path; _host_synced remains False so an
        # explicit _sync_host can still fetch them)
        rows_arr = np.asarray(img_rows, np.int64)
        self.best_line3d[rows_arr, :, 0] = floats_np[rows_arr, :, 0:3]
        self.best_line3d[rows_arr, :, 1] = floats_np[rows_arr, :, 3:6]
        self.best_depths[rows_arr] = floats_np[rows_arr, :, 6:8]
        self.best_unc[rows_arr] = floats_np[rows_arr, :, 8]
        self.best_score[rows_arr] = floats_np[rows_arr, :, 9]
        if not has_edge.any():
            return None
        # und consumers only need per-node degree > 0; synthesize
        # self-edges for flagged nodes (shape [E, 2])
        nodes = np.nonzero(has_edge)[0]
        und = np.stack([nodes, nodes], 1)
        return (np.asarray(labels, np.int64), und, f[:, 0:3], f[:, 3:6],
                f[:, 8], f[:, 9])

    def _cluster_labels(self):
        """run_clustering (global_line_triangulator.cc:234-291): valid
        undirected edges -> linker-gated edge list -> per-node labels.
        Returns (labels, und, b_start, b_end, b_unc, b_score) or None
        when there are no edges."""
        if (self.cfg.min_num_outer_edges <= 0
                and self.cfg.merging_strategy == "greedy"
                and self._dev_results is not None
                and not getattr(self, "_host_synced", True)):
            return self._cluster_labels_device()
        self._sync_host()
        I = len(self.img_ids)
        L = self.L
        flags = self._filter_by_num_outer_edges()

        # undirected candidate edges between valid nodes
        src = np.repeat(np.arange(I * L).reshape(I, L)[..., None],
                        self.cfg.max_tris_per_node, axis=-1).reshape(-1)
        dst = self.valid_edge_ng.reshape(-1)
        ok = dst >= 0
        src, dst = src[ok], dst[ok]
        flags_flat = flags.reshape(-1)
        ok = flags_flat[src] & flags_flat[dst]
        src, dst = src[ok], dst[ok]
        und = np.unique(np.sort(np.stack([src, dst], 1), axis=1), axis=0)

        if len(und) == 0:
            return None

        # edge test: 3D linker score on the best tris (cc:276-284;
        # reference keeps score = score_3d only).  Jitted + edge-count
        # bucketed so the whole scoring is one fused device call.
        cfg3d_cluster = self.cfg.linker3d.to_spatial_merging()
        b_start = self.best_line3d[..., 0, :].reshape(I * L, 3)
        b_end = self.best_line3d[..., 1, :].reshape(I * L, 3)
        b_unc = self.best_unc.reshape(I * L)
        b_score = self.best_score.reshape(I * L)

        ekey = ("edge_score", repr(cfg3d_cluster))
        if ekey not in _KERNEL_CACHE:
            @partial(jax.jit, static_argnums=())
            def edge_score_kernel(s1, e1, u1, s2, e2, u2):
                l1 = Segments(s1, e1, uncertainty=u1)
                l2 = Segments(s2, e2, uncertainty=u2)
                return score_3d(l1, l2, cfg3d_cluster)

            _KERNEL_CACHE[ekey] = edge_score_kernel

        E_bucket = int(2 ** np.ceil(np.log2(max(len(und), 32))))
        und_pad = np.zeros((E_bucket, 2), np.int64)
        und_pad[:len(und)] = und
        escore = np.asarray(_KERNEL_CACHE[ekey](
            jnp.asarray(b_start[und_pad[:, 0]]),
            jnp.asarray(b_end[und_pad[:, 0]]),
            jnp.asarray(b_unc[und_pad[:, 0]]),
            jnp.asarray(b_start[und_pad[:, 1]]),
            jnp.asarray(b_end[und_pad[:, 1]]),
            jnp.asarray(b_unc[und_pad[:, 1]])))[:len(und)]
        both_valid = (b_score[und[:, 0]] > 0) & (b_score[und[:, 1]] > 0)
        keep = (escore > 0) & both_valid
        escore = escore[keep]
        und = und[keep]
        if len(und) == 0:
            return None

        strategy = self.cfg.merging_strategy
        if strategy in ("exhaustive", "avg"):
            # linker-gated Kruskal variants (merging.cc:105-345); run on
            # the participating-node subgraph to keep the host
            # union-find loops small
            from limap_tpu.merging.strategies import (
                compute_track_labels_avg, compute_track_labels_exhaustive)
            nodes = np.unique(und.reshape(-1))
            remap = np.full(I * L, -1, np.int64)
            remap[nodes] = np.arange(len(nodes))
            sub_edges = remap[und]
            node_lines = np.stack([b_start[nodes], b_end[nodes]], axis=1)
            fn = (compute_track_labels_avg if strategy == "avg"
                  else compute_track_labels_exhaustive)
            sub_labels = np.asarray(fn(sub_edges, escore, node_lines,
                                       nodes // L, self.cfg.linker3d))
            labels = np.arange(I * L)
            labels[nodes] = I * L + sub_labels  # disjoint label space
        elif strategy == "greedy":
            # order-independent connected components on device
            E_pad = int(2 ** np.ceil(np.log2(max(len(und), 1))))
            edges_pad = np.zeros((E_pad, 2), np.int32)
            edges_pad[:len(und)] = und
            emask = np.arange(E_pad) < len(und)
            labels = np.asarray(connected_components(
                I * L, jnp.asarray(edges_pad), jnp.asarray(emask)))
        else:
            raise ValueError(
                f"unknown merging_strategy {strategy!r}; expected "
                "'greedy', 'exhaustive' or 'avg'")
        return labels, und, b_start, b_end, b_unc, b_score

    def _grouped_nodes(self, labels, und):
        """Nodes with >= 1 valid edge, sorted by component label;
        returns (nodes, track_of) keeping only components of >= 2."""
        I, L = len(self.img_ids), self.L
        deg = np.zeros(I * L, np.int64)
        np.add.at(deg, und.reshape(-1), 1)
        node_ids = np.nonzero(deg > 0)[0]
        lab = labels[node_ids]
        order = np.argsort(lab, kind="stable")
        node_ids = node_ids[order]
        lab = lab[order]
        _, inv, counts = np.unique(lab, return_inverse=True,
                                   return_counts=True)
        keep_grp = counts >= 2
        new_idx = np.cumsum(keep_grp) - 1
        keep = keep_grp[inv]
        return node_ids[keep], new_idx[inv[keep]].astype(np.int64)

    def compute_track_batch(self, pow2_buckets: bool = True,
                            return_host: bool = False):
        """Vectorized track build straight into a padded
        :class:`TrackBatch` — the batch-resident fast path the runner
        and bench consume (host LineTrack objects never materialize;
        equivalence with :meth:`compute_line_tracks` is asserted in
        tests/test_batch_chain.py).  Returns None when no tracks; with
        ``return_host`` returns (batch, HostTrackBatch support mirror —
        its ``line`` is zeros until refreshed from the device)."""
        from limap_tpu.base.linetrack import batch_from_flat_supports
        res = self._cluster_labels()
        if res is None:
            return (None, None) if return_host else None
        labels, und, b_start, b_end, b_unc, b_score = res
        nodes, track_of = self._grouped_nodes(labels, und)
        if not len(nodes):
            return (None, None) if return_host else None
        I, L = len(self.img_ids), self.L
        l2s = np.asarray(self.lines2d.start).reshape(I * L, 2)
        l2e = np.asarray(self.lines2d.end).reshape(I * L, 2)
        img_ids_arr = np.asarray(self.img_ids)
        rows = nodes // L
        batch, (ti, si), *rest = batch_from_flat_supports(
            track_of, rows.astype(np.int32),
            img_ids_arr[rows].astype(np.int32),
            (nodes % L).astype(np.int32),
            np.stack([l2s[nodes], l2e[nodes]], 1),
            np.stack([b_start[nodes], b_end[nodes]], 1),
            b_score[nodes].astype(np.float32),
            num_tracks=int(track_of[-1]) + 1,
            pow2_buckets=pow2_buckets, return_slots=True,
            return_host=return_host)
        # batched aggregation (cc:346-351) with the triangulation
        # uncertainty (min over the two proposal views)
        u_pad = np.ones(batch.mask.shape, np.float32)
        u_pad[ti, si] = b_unc[nodes]
        seg3d = batch.line3d._replace(uncertainty=jnp.asarray(u_pad))
        agg = aggregate_tracks(seg3d, batch.score, batch.mask,
                               self.cfg.num_outliers_aggregator)
        batch = batch._replace(line=agg)
        return (batch, rest[0]) if return_host else batch

    def compute_line_tracks(self) -> List[LineTrack]:
        """run_clustering + build_tracks_from_clusters
        (global_line_triangulator.cc:234-359)."""
        res = self._cluster_labels()
        if res is None:
            return []
        labels, und, b_start, b_end, b_unc, b_score = res
        nodes, track_of = self._grouped_nodes(labels, und)
        if not len(nodes):
            return []
        I, L = len(self.img_ids), self.L
        splits = np.nonzero(np.diff(track_of))[0] + 1
        groups = np.split(nodes, splits)

        l2s = np.asarray(self.lines2d.start).reshape(I * L, 2)
        l2e = np.asarray(self.lines2d.end).reshape(I * L, 2)
        img_ids_arr = np.asarray(self.img_ids)

        tracks = []
        for g in groups:
            tracks.append(LineTrack(
                image_id_list=[int(img_ids_arr[n // L]) for n in g],
                line_id_list=[int(n % L) for n in g],
                line2d_list=[np.stack([l2s[n], l2e[n]]) for n in g],
                line3d_list=[np.stack([b_start[n], b_end[n]]) for n in g],
                score_list=[float(b_score[n]) for n in g],
                node_id_list=[int(n) for n in g],
            ))

        # batched aggregation (cc:346-351)
        batch = tracks_to_batch(tracks, self.id2idx)
        S = batch.max_supports
        u_pad = np.ones((len(groups), S), np.float32)
        for gi, g in enumerate(groups):
            n = min(len(g), S)
            u_pad[gi, :n] = b_unc[g[:n]]
        seg3d = batch.line3d._replace(uncertainty=jnp.asarray(u_pad))
        agg = aggregate_tracks(seg3d, batch.score, batch.mask,
                               self.cfg.num_outliers_aggregator)
        agg_s, agg_e = np.asarray(agg.start), np.asarray(agg.end)
        for i, tr in enumerate(tracks):
            tr.line = np.stack([agg_s[i], agg_e[i]])
        return tracks
