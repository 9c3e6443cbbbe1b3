"""Line3D++ interop: export format + result-file import round-trip
(reference util/io.py:220-257 export, :349-396 import)."""

import numpy as np

import tests.conftest  # noqa: F401

from limap_tpu.util import io as limapio


def test_read_txt_line3dpp(tmp_path):
    # one record: 2 collinear 3D segments, 3 supports
    rec = ["2"]
    rec += ["0 0 5 1 0 5", "1 0 5 2 0 5"]
    rec += ["3"]
    rec += ["0 4 10 10 50 10", "1 7 12 12 52 12", "2 9 14 14 54 14"]
    # second record: 1 segment, 2 supports
    rec2 = ["1", "0 1 6 0 2 6", "2", "0 2 20 20 20 60", "1 3 22 20 22 60"]
    fname = tmp_path / "Line3D++_result.txt"
    fname.write_text(" ".join(rec) + "\n" + " ".join(rec2) + "\n")

    tracks, track_ids, counts, mergemat = \
        limapio.read_txt_Line3Dpp(str(fname))
    assert len(tracks) == 2
    assert tracks[0].count_images() == 3
    assert tracks[1].count_images() == 2
    assert np.allclose(tracks[0].line, [[0, 0, 5], [1, 0, 5]])
    assert tracks[0].image_id_list == [0, 1, 2]
    assert tracks[0].line_id_list == [4, 7, 9]
    assert np.allclose(tracks[0].line2d_list[0], [[10, 10], [50, 10]])
    # 3 collinear source lines -> merge matrix [2, 3]
    assert mergemat.shape == (2, 3)
    assert track_ids == [0, 0, 1]
    assert counts == [3, 3, 2]
    assert mergemat[0, :2].sum() == 2 and mergemat[1, 2] == 1
