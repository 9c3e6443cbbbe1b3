"""Line tracks: host objects + padded device batches.

:class:`LineTrack` mirrors the reference container
(/root/reference/src/limap/base/linetrack.h:19-57) including its txt
Read/Write format, so outputs interoperate with LIMAP tooling.

:class:`TrackBatch` is the TPU-side representation: all tracks padded to
a common support count ``S`` with a boolean mask — the shape every
batched kernel (aggregation, filtering, BA) consumes.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from limap_tpu.base.lines import Segments


class LineTrack:
    def __init__(self, line=None, image_id_list=None, line_id_list=None,
                 line2d_list=None, line3d_list=None, score_list=None,
                 node_id_list=None):
        # line: (2, 3) array [start; end]
        self.line = (np.zeros((2, 3)) if line is None
                     else np.asarray(line, dtype=np.float64))
        self.image_id_list: List[int] = list(image_id_list or [])
        self.line_id_list: List[int] = list(line_id_list or [])
        # line2d_list: [N, 2, 2]; line3d_list: [N, 2, 3]
        self.line2d_list = [np.asarray(l, np.float64)
                            for l in (line2d_list or [])]
        self.line3d_list = [np.asarray(l, np.float64)
                            for l in (line3d_list or [])]
        self.score_list: List[float] = list(score_list or [])
        self.node_id_list: List[int] = list(node_id_list or [])
        self.active = True

    # ---- stats (linetrack.h:46-50) ----
    def count_lines(self) -> int:
        return len(self.image_id_list)

    def GetSortedImageIds(self) -> List[int]:
        return sorted(set(self.image_id_list))

    def count_images(self) -> int:
        return len(set(self.image_id_list))

    def HasImage(self, image_id: int) -> bool:
        return image_id in self.image_id_list

    def GetIdMap(self) -> Dict[int, List[int]]:
        out: Dict[int, List[int]] = {}
        for idx, img_id in enumerate(self.image_id_list):
            out.setdefault(img_id, []).append(idx)
        return out

    @property
    def start(self) -> np.ndarray:
        return self.line[0]

    @property
    def end(self) -> np.ndarray:
        return self.line[1]

    def length(self) -> float:
        return float(np.linalg.norm(self.line[1] - self.line[0]))

    def as_dict(self) -> dict:
        return {
            "line": self.line.tolist(),
            "image_id_list": self.image_id_list,
            "line_id_list": self.line_id_list,
            "line2d_list": [l.tolist() for l in self.line2d_list],
            "line3d_list": [l.tolist() for l in self.line3d_list],
            "score_list": self.score_list,
            "node_id_list": self.node_id_list,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "LineTrack":
        return cls(line=d["line"], image_id_list=d["image_id_list"],
                   line_id_list=d["line_id_list"],
                   line2d_list=d.get("line2d_list"),
                   line3d_list=d.get("line3d_list"),
                   score_list=d.get("score_list"),
                   node_id_list=d.get("node_id_list"))

    # ---- txt IO, format-compatible with linetrack.cc Write/Read ----
    def Write(self, filename: str) -> None:
        n_lines = self.count_lines()
        with open(filename, "w") as f:
            vals = list(np.nan_to_num(self.line[0])) + list(
                np.nan_to_num(self.line[1]))
            f.write(" ".join(f"{v:.10f}" for v in vals) + " \n")
            f.write(f"{n_lines} {self.count_images()}\n")
            f.write("image_id_list " +
                    " ".join(str(i) for i in self.image_id_list) + " \n")
            f.write("line_id_list " +
                    " ".join(str(i) for i in self.line_id_list) + " \n")
            f.write("line2d_list\n")
            for l in self.line2d_list:
                f.write(f"{l[0][0]:.10f} {l[0][1]:.10f} "
                        f"{l[1][0]:.10f} {l[1][1]:.10f} \n")
            if self.node_id_list:
                f.write("node_id_list " +
                        " ".join(str(i) for i in self.node_id_list) + " \n")
            if self.score_list:
                f.write("score_list " +
                        " ".join(f"{s:.10f}" for s in self.score_list) + " \n")
            if self.line3d_list:
                f.write("line3d_list\n")
                for l in self.line3d_list:
                    f.write(f"{l[0][0]:.10f} {l[0][1]:.10f} {l[0][2]:.10f} "
                            f"{l[1][0]:.10f} {l[1][1]:.10f} {l[1][2]:.10f} \n")
            f.write("END\n")

    def Read(self, filename: str) -> "LineTrack":
        with open(filename) as f:
            lines = [ln.strip() for ln in f.readlines()]
        vals = [float(v) for v in lines[0].split()]
        self.line = np.array([vals[:3], vals[3:6]])
        n_lines = int(lines[1].split()[0])
        self.image_id_list = [int(v) for v in lines[2].split()[1:]]
        self.line_id_list = [int(v) for v in lines[3].split()[1:]]
        assert lines[4] == "line2d_list"
        self.line2d_list = []
        row = 5
        for i in range(n_lines):
            v = [float(x) for x in lines[row + i].split()]
            self.line2d_list.append(np.array([v[:2], v[2:4]]))
        row += n_lines
        self.node_id_list, self.score_list, self.line3d_list = [], [], []
        while row < len(lines) and lines[row] != "END":
            tok = lines[row].split()
            if tok[0] == "node_id_list":
                self.node_id_list = [int(v) for v in tok[1:]]
                row += 1
            elif tok[0] == "score_list":
                self.score_list = [float(v) for v in tok[1:]]
                row += 1
            elif tok[0] == "line3d_list":
                row += 1
                for i in range(n_lines):
                    v = [float(x) for x in lines[row + i].split()]
                    self.line3d_list.append(np.array([v[:3], v[3:6]]))
                row += n_lines
            else:
                row += 1
        return self


class TrackBatch(NamedTuple):
    """Padded SoA batch of ``T`` tracks with up to ``S`` supports each.

    ``img_index`` holds dense row indices into the image batch (NOT raw
    image ids) so kernels can gather camera parameters directly.
    """

    line: Segments                 # fields [T, 3]
    img_index: jnp.ndarray         # [T, S] int32 (dense image row)
    image_ids: jnp.ndarray         # [T, S] int32 (original image ids)
    line_ids: jnp.ndarray          # [T, S] int32
    line2d: Segments               # fields [T, S, 2]
    line3d: Segments               # fields [T, S, 3]
    score: jnp.ndarray             # [T, S]
    mask: jnp.ndarray              # [T, S] bool
    track_mask: jnp.ndarray        # [T] bool (False = padded track)

    @property
    def num_tracks(self) -> int:
        return self.mask.shape[0]

    @property
    def max_supports(self) -> int:
        return self.mask.shape[1]

    def count_lines(self) -> jnp.ndarray:
        return jnp.sum(self.mask, axis=1)

    def count_images(self) -> jnp.ndarray:
        """Number of distinct supporting images per track.

        Counted via sorting image ids per track (padded with a sentinel),
        branch-free.
        """
        big = jnp.int32(2**30)
        ids = jnp.where(self.mask, self.img_index, big)
        s = jnp.sort(ids, axis=1)
        diff = jnp.concatenate(
            [jnp.ones_like(s[:, :1], dtype=bool), s[:, 1:] != s[:, :-1]],
            axis=1)
        return jnp.sum(diff & (s < big), axis=1)


def _round_up(n: int, multiple: int) -> int:
    return ((max(n, 1) + multiple - 1) // multiple) * multiple


def _pow2(n: int) -> int:
    from limap_tpu.util import shape_bucket
    return shape_bucket(n, min_bucket=2)


def batch_from_flat_supports(
        track_of: np.ndarray,          # [E] track index per support, SORTED
        img_index: np.ndarray,         # [E] dense image row per support
        image_ids: np.ndarray,         # [E]
        line_ids: np.ndarray,          # [E]
        l2d: np.ndarray,               # [E, 2, 2]
        l3d: np.ndarray,               # [E, 2, 3]
        score: np.ndarray,             # [E]
        line: Optional[np.ndarray] = None,   # [T, 2, 3] or None
        num_tracks: Optional[int] = None,
        support_multiple: int = 8,
        pow2_buckets: bool = False,
        return_slots: bool = False,
        return_host: bool = False) -> TrackBatch:
    """Vectorized host packer: flat supports grouped by ``track_of``
    (which must be non-decreasing) -> padded :class:`TrackBatch`.

    This replaces Python loops over tracks x supports: every field is
    filled with ONE fancy-indexed scatter.  With ``pow2_buckets`` the
    [T, S] shape is padded to powers of two so downstream jitted
    kernels see a bounded set of shapes per scene.
    """
    E = len(track_of)
    T = int(num_tracks if num_tracks is not None
            else (track_of[-1] + 1 if E else 0))
    counts = np.bincount(track_of, minlength=max(T, 1)) if E else \
        np.zeros(max(T, 1), np.int64)
    S_needed = int(counts.max()) if E else 1
    if pow2_buckets:
        T_pad = _pow2(max(T, 2))
        S = _pow2(max(S_needed, 2))
    else:
        T_pad = max(T, 1)
        S = _round_up(S_needed, support_multiple)
    # slot index of each support within its track
    starts = np.zeros(max(T, 1), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    si = np.arange(E, dtype=np.int64) - starts[track_of] if E else \
        np.zeros(0, np.int64)

    out_img_index = np.zeros((T_pad, S), np.int32)
    out_image_ids = np.zeros((T_pad, S), np.int32)
    out_line_ids = np.zeros((T_pad, S), np.int32)
    out_l2d = np.zeros((T_pad, S, 2, 2), np.float32)
    out_l3d = np.zeros((T_pad, S, 2, 3), np.float32)
    out_score = np.zeros((T_pad, S), np.float32)
    out_mask = np.zeros((T_pad, S), bool)
    track_mask = np.zeros((T_pad,), bool)
    track_mask[:T] = True
    if E:
        ti = track_of
        out_img_index[ti, si] = img_index
        out_image_ids[ti, si] = image_ids
        out_line_ids[ti, si] = line_ids
        out_l2d[ti, si] = l2d
        out_l3d[ti, si] = l3d
        out_score[ti, si] = score
        out_mask[ti, si] = True
    out_line = np.zeros((T_pad, 2, 3), np.float32)
    if line is not None:
        out_line[:T] = line[:T]
    batch = TrackBatch(
        line=Segments(jnp.asarray(out_line[:, 0]),
                      jnp.asarray(out_line[:, 1])),
        img_index=jnp.asarray(out_img_index),
        image_ids=jnp.asarray(out_image_ids),
        line_ids=jnp.asarray(out_line_ids),
        line2d=Segments(jnp.asarray(out_l2d[:, :, 0]),
                        jnp.asarray(out_l2d[:, :, 1])),
        line3d=Segments(jnp.asarray(out_l3d[:, :, 0]),
                        jnp.asarray(out_l3d[:, :, 1])),
        score=jnp.asarray(out_score),
        mask=jnp.asarray(out_mask),
        track_mask=jnp.asarray(track_mask),
    )
    if return_slots or return_host:
        extras = []
        if return_slots:
            extras.append((track_of if E else np.zeros(0, np.int64), si))
        if return_host:
            extras.append(HostTrackBatch(
                np.stack([out_line[:, 0], out_line[:, 1]], 1),
                out_img_index, out_image_ids, out_line_ids, out_l2d,
                out_l3d, out_score, out_mask, track_mask))
        return (batch, *extras)
    return batch


class HostTrackBatch(NamedTuple):
    """Host-side (numpy) mirror of TrackBatch's support fields, used by
    the batch-resident filter/remerge chain to regroup supports without
    device round trips.  ``download`` pulls a TrackBatch once."""

    line: np.ndarray        # [T, 2, 3]
    img_index: np.ndarray   # [T, S]
    image_ids: np.ndarray
    line_ids: np.ndarray
    l2d: np.ndarray         # [T, S, 2, 2]
    l3d: np.ndarray         # [T, S, 2, 3]
    score: np.ndarray
    mask: np.ndarray
    track_mask: np.ndarray

    def refresh(self, batch: TrackBatch,
                with_line: bool = False) -> "HostTrackBatch":
        """Pull ONLY the fields the device-side filters mutate (mask,
        track_mask, optionally the aggregated/BA'd line) — the support
        fields never change on device, so the full ~MB download of
        :meth:`download` is unnecessary when a mirror exists."""
        import jax
        if with_line:
            mk, tm, ls, le = jax.device_get(
                [batch.mask, batch.track_mask, batch.line.start,
                 batch.line.end])
            return self._replace(mask=np.asarray(mk),
                                 track_mask=np.asarray(tm),
                                 line=np.stack([ls, le], 1))
        mk, tm = jax.device_get([batch.mask, batch.track_mask])
        return self._replace(mask=np.asarray(mk),
                             track_mask=np.asarray(tm))

    @classmethod
    def download(cls, batch: TrackBatch) -> "HostTrackBatch":
        import jax
        (ls, le, ii, ids, li, l2s, l2e, l3s, l3e, sc, mk, tm) = \
            jax.device_get([batch.line.start, batch.line.end,
                            batch.img_index, batch.image_ids,
                            batch.line_ids, batch.line2d.start,
                            batch.line2d.end, batch.line3d.start,
                            batch.line3d.end, batch.score, batch.mask,
                            batch.track_mask])
        return cls(np.stack([ls, le], 1), np.asarray(ii),
                   np.asarray(ids), np.asarray(li),
                   np.stack([l2s, l2e], 2), np.stack([l3s, l3e], 2),
                   np.asarray(sc), np.asarray(mk), np.asarray(tm))

    def flat_supports(self):
        """(track_of, per-support field tuple) of all valid supports of
        valid tracks, ordered by track."""
        valid = self.mask & self.track_mask[:, None]
        ti, si = np.nonzero(valid)
        return ti, (self.img_index[ti, si], self.image_ids[ti, si],
                    self.line_ids[ti, si], self.l2d[ti, si],
                    self.l3d[ti, si], self.score[ti, si])


def tracks_to_batch(tracks: Sequence[LineTrack],
                    img_id_to_index: Dict[int, int],
                    max_supports: Optional[int] = None,
                    pad_tracks_to: Optional[int] = None,
                    support_multiple: int = 8) -> TrackBatch:
    """Pack host tracks into a padded device batch (vectorized)."""
    T = len(tracks)
    counts = np.fromiter((t.count_lines() for t in tracks), np.int64,
                         count=T)
    S_needed = int(counts.max()) if T else 1
    S = max_supports or _round_up(S_needed, support_multiple)
    T_pad = pad_tracks_to or max(T, 1)
    # clip over-long tracks to S (mirrors the old behavior)
    cl = np.minimum(counts, S)
    E = int(cl.sum())
    track_of = np.repeat(np.arange(T, dtype=np.int64), cl)
    starts = np.zeros(max(T, 1), np.int64)
    np.cumsum(cl[:-1], out=starts[1:] if T else starts[:0])
    si = np.arange(E, dtype=np.int64) - starts[track_of]

    img_index = np.zeros((T_pad, S), np.int32)
    image_ids = np.zeros((T_pad, S), np.int32)
    line_ids = np.zeros((T_pad, S), np.int32)
    l2d = np.zeros((T_pad, S, 2, 2), np.float32)
    l3d = np.zeros((T_pad, S, 2, 3), np.float32)
    score = np.zeros((T_pad, S), np.float32)
    mask = np.zeros((T_pad, S), bool)
    track_mask = np.zeros((T_pad,), bool)
    track_mask[:T] = True
    line = np.zeros((T_pad, 2, 3), np.float32)

    if T:
        line[:T] = np.stack([np.asarray(t.line, np.float64)
                             for t in tracks])
        ids_flat = np.concatenate(
            [np.asarray(t.image_id_list[:S], np.int64) for t in tracks]) \
            if E else np.zeros(0, np.int64)
        lut_keys = np.unique(ids_flat) if E else np.zeros(0, np.int64)
        lut_vals = np.array([img_id_to_index[int(k)] for k in lut_keys],
                            np.int32) if E else np.zeros(0, np.int32)
        if E:
            rows_flat = lut_vals[np.searchsorted(lut_keys, ids_flat)]
            img_index[track_of, si] = rows_flat
            image_ids[track_of, si] = ids_flat
            line_ids[track_of, si] = np.concatenate(
                [np.asarray(t.line_id_list[:S], np.int64)
                 for t in tracks])
            # line2d is mandatory; line3d/score are optional per track
            # (zeros when absent), matching the per-support loop this
            # packer replaced
            l2d[track_of, si] = np.concatenate(
                [np.asarray(t.line2d_list[:S],
                            np.float64).reshape(-1, 2, 2)
                 for n, t in zip(cl, tracks) if n]) \
                if E else 0.0
            l3d[track_of, si] = np.concatenate(
                [np.asarray(t.line3d_list[:S],
                            np.float64).reshape(-1, 2, 3)
                 if t.line3d_list else np.zeros((n, 2, 3))
                 for n, t in zip(cl, tracks) if n])
            score[track_of, si] = np.concatenate(
                [np.asarray(t.score_list[:S], np.float64)
                 if t.score_list else np.zeros(n)
                 for n, t in zip(cl, tracks) if n])
            mask[track_of, si] = True

    return TrackBatch(
        line=Segments(jnp.asarray(line[:, 0]), jnp.asarray(line[:, 1])),
        img_index=jnp.asarray(img_index),
        image_ids=jnp.asarray(image_ids),
        line_ids=jnp.asarray(line_ids),
        line2d=Segments(jnp.asarray(l2d[:, :, 0]), jnp.asarray(l2d[:, :, 1])),
        line3d=Segments(jnp.asarray(l3d[:, :, 0]), jnp.asarray(l3d[:, :, 1])),
        score=jnp.asarray(score),
        mask=jnp.asarray(mask),
        track_mask=jnp.asarray(track_mask),
    )


def batch_to_tracks(batch: TrackBatch,
                    host: Optional[HostTrackBatch] = None
                    ) -> List[LineTrack]:
    """Unpack a device batch back into host tracks (drops padding).

    Vectorized: one device download, one nonzero over the mask, then
    per-track views via ``np.split`` — no per-support Python work.
    With a ``host`` mirror only the mutated fields (mask/track_mask/
    line) are re-downloaded.
    """
    host = (host.refresh(batch, with_line=True) if host is not None
            else HostTrackBatch.download(batch))
    tmask = host.track_mask
    T = len(tmask)
    valid = host.mask & tmask[:, None]
    ti, si = np.nonzero(valid)
    counts = np.bincount(ti, minlength=T)
    splits = np.cumsum(counts)[:-1]
    img_ids_split = np.split(host.image_ids[ti, si].astype(np.int64),
                             splits)
    line_ids_split = np.split(host.line_ids[ti, si].astype(np.int64),
                              splits)
    l2d_split = np.split(host.l2d[ti, si].astype(np.float64), splits)
    l3d_split = np.split(host.l3d[ti, si].astype(np.float64), splits)
    score_split = np.split(host.score[ti, si].astype(np.float64), splits)
    line64 = host.line.astype(np.float64)

    tracks = []
    for t in range(T):
        if not tmask[t]:
            continue
        tr = LineTrack.__new__(LineTrack)
        tr.line = line64[t]
        tr.image_id_list = img_ids_split[t].tolist()
        tr.line_id_list = line_ids_split[t].tolist()
        tr.line2d_list = list(l2d_split[t])
        tr.line3d_list = list(l3d_split[t])
        tr.score_list = score_split[t].tolist()
        tr.node_id_list = []
        tr.active = True
        tracks.append(tr)
    return tracks
