import jax.numpy as jnp
import numpy as np

import limap_tpu.ops.connected_components as cc


def test_cc_matches_union_find(rng):
    n = 200
    n_edges = 300
    edges = rng.integers(0, n, size=(n_edges, 2))
    mask = rng.uniform(size=n_edges) < 0.8
    labels = np.asarray(cc.connected_components(
        n, jnp.asarray(edges, jnp.int32), jnp.asarray(mask)))
    ref = cc.union_find_numpy(n, edges[mask])
    # same partition: equality matrices must agree
    assert labels.shape == (n,)
    same_ours = labels[:, None] == labels[None, :]
    same_ref = ref[:, None] == ref[None, :]
    assert np.array_equal(same_ours, same_ref)


def test_cc_empty_edges():
    labels = np.asarray(cc.connected_components(
        10, jnp.zeros((5, 2), jnp.int32), jnp.zeros(5, bool)))
    np.testing.assert_array_equal(labels, np.arange(10))


def test_compact_labels():
    labels = jnp.asarray([0, 0, 2, 2, 4, 0], jnp.int32)
    dense, n_comp = cc.compact_labels(labels)
    assert int(n_comp) == 3
    d = np.asarray(dense)
    assert d[0] == d[1] == d[5]
    assert d[2] == d[3]
    assert len({d[0], d[2], d[4]}) == 3


def test_compact_labels_with_mask():
    labels = jnp.asarray([0, 0, 2, 2], jnp.int32)
    mask = jnp.asarray([True, True, False, False])
    dense, n_comp = cc.compact_labels(labels, mask)
    assert int(n_comp) == 1
    d = np.asarray(dense)
    assert d[0] == d[1] == 0
    assert d[2] == d[3] == -1


def test_count_component_sizes():
    dense = jnp.asarray([0, 0, 1, -1, 1, 1], jnp.int32)
    sizes = np.asarray(cc.count_component_sizes(dense, 4))
    np.testing.assert_array_equal(sizes, [2, 3, 0, 0])
