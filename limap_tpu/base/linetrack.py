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


def tracks_to_batch(tracks: Sequence[LineTrack],
                    img_id_to_index: Dict[int, int],
                    max_supports: Optional[int] = None,
                    pad_tracks_to: Optional[int] = None,
                    support_multiple: int = 8) -> TrackBatch:
    """Pack host tracks into a padded device batch."""
    T = len(tracks)
    S_needed = max((t.count_lines() for t in tracks), default=1)
    S = max_supports or _round_up(S_needed, support_multiple)
    T_pad = pad_tracks_to or max(T, 1)

    line = np.zeros((T_pad, 2, 3), np.float32)
    img_index = np.zeros((T_pad, S), np.int32)
    image_ids = np.zeros((T_pad, S), np.int32)
    line_ids = np.zeros((T_pad, S), np.int32)
    l2d = np.zeros((T_pad, S, 2, 2), np.float32)
    l3d = np.zeros((T_pad, S, 2, 3), np.float32)
    score = np.zeros((T_pad, S), np.float32)
    mask = np.zeros((T_pad, S), bool)
    track_mask = np.zeros((T_pad,), bool)

    for ti, tr in enumerate(tracks):
        n = min(tr.count_lines(), S)
        track_mask[ti] = True
        line[ti] = tr.line
        for si in range(n):
            img_index[ti, si] = img_id_to_index[tr.image_id_list[si]]
            image_ids[ti, si] = tr.image_id_list[si]
            line_ids[ti, si] = tr.line_id_list[si]
            l2d[ti, si] = tr.line2d_list[si]
            if tr.line3d_list:
                l3d[ti, si] = tr.line3d_list[si]
            if tr.score_list:
                score[ti, si] = tr.score_list[si]
            mask[ti, si] = True

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


def batch_to_tracks(batch: TrackBatch) -> List[LineTrack]:
    """Unpack a device batch back into host tracks (drops padding)."""
    line_s = np.asarray(batch.line.start)
    line_e = np.asarray(batch.line.end)
    img_ids = np.asarray(batch.image_ids)
    line_ids = np.asarray(batch.line_ids)
    l2s = np.asarray(batch.line2d.start)
    l2e = np.asarray(batch.line2d.end)
    l3s = np.asarray(batch.line3d.start)
    l3e = np.asarray(batch.line3d.end)
    score = np.asarray(batch.score)
    mask = np.asarray(batch.mask)
    tmask = np.asarray(batch.track_mask)

    tracks = []
    for ti in range(batch.num_tracks):
        if not tmask[ti]:
            continue
        sel = mask[ti]
        tr = LineTrack(
            line=np.stack([line_s[ti], line_e[ti]]),
            image_id_list=img_ids[ti][sel].tolist(),
            line_id_list=line_ids[ti][sel].tolist(),
            line2d_list=[np.stack([l2s[ti, i], l2e[ti, i]])
                         for i in np.nonzero(sel)[0]],
            line3d_list=[np.stack([l3s[ti, i], l3e[ti, i]])
                         for i in np.nonzero(sel)[0]],
            score_list=score[ti][sel].tolist(),
        )
        tracks.append(tr)
    return tracks
