import numpy as np

from limap_tpu.ops import hostops
from limap_tpu.ops.connected_components import union_find_numpy


def test_union_find_matches_python(rng):
    n = 500
    edges = rng.integers(0, n, size=(800, 2))
    lab = hostops.union_find(n, edges)
    ref = union_find_numpy(n, edges)
    assert ((lab[:, None] == lab[None, :])
            == (ref[:, None] == ref[None, :])).all()


def test_group_and_pack(rng):
    labels = np.asarray([5, 5, 2, 2, 2, 9, 5])
    valid = np.asarray([1, 1, 1, 1, 0, 1, 1], bool)
    ids, offs = hostops.group_by_labels(labels, valid)
    assert len(offs) - 1 == 3
    groups = [set(ids[offs[g]:offs[g + 1]]) for g in range(3)]
    assert groups[0] == {2, 3}
    assert groups[1] == {0, 1, 6}
    assert groups[2] == {5}
    idx, mask = hostops.pack_supports(ids, offs, 2)
    assert idx.shape == (3, 2)
    assert mask.sum() == 2 + 2 + 1  # group 1 truncated to S=2
