"""Multi-device (8 virtual CPU) sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsiseg_tpu.parallel.mesh import (batch_sharding, canvas_row_sharding,
                                      make_mesh, replicate_tree, shard_batch)


def test_mesh_construction():
    mesh = make_mesh(shape=(-1,), axes=("data",))
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh(shape=(2, 4), axes=("data", "model"))
    assert mesh2.devices.shape == (2, 4)


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(shape=(8,), axes=("data",))
    batch = {"x": np.arange(16 * 4, dtype=np.float32).reshape(16, 4)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_data_parallel_mean_matches_single_device():
    """A jitted global-mean loss over a sharded batch must equal the
    single-device value (GSPMD inserts the cross-device reduction)."""
    mesh = make_mesh(shape=(8,), axes=("data",))
    x = np.random.RandomState(0).randn(32, 8).astype(np.float32)
    w = np.random.RandomState(1).randn(8, 3).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    expected = float(loss(jnp.asarray(w), jnp.asarray(x)))
    with mesh:
        xs = jax.device_put(x, batch_sharding(mesh))
        wr = replicate_tree(mesh, jnp.asarray(w))
        got = float(jax.jit(loss)(wr, xs))
        g1 = jax.jit(jax.grad(loss))(jnp.asarray(w), jnp.asarray(x))
        g8 = jax.jit(jax.grad(loss))(wr, xs)
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1), rtol=1e-4)


def test_canvas_row_sharding_scatter():
    """Row-sharded canvas: on-device scatter-add still produces the global
    result (stripes + halo handled by GSPMD)."""
    from wsiseg_tpu.ops.stitch import scatter_add_tiles
    mesh = make_mesh(shape=(8,), axes=("data",))
    canvas = np.zeros((64, 32, 2), np.float32)
    tiles = np.random.RandomState(0).randn(6, 16, 16, 2).astype(np.float32)
    ys = np.array([0, 8, 24, 40, 44, 48], np.int32)
    xs = np.array([0, 8, 4, 0, 8, 16], np.int32)

    expected = canvas.copy()
    for b in range(6):
        expected[ys[b]:ys[b] + 16, xs[b]:xs[b] + 16] += tiles[b]

    with mesh:
        cv = jax.device_put(canvas, canvas_row_sharding(mesh))
        out = jax.jit(scatter_add_tiles)(cv, jnp.asarray(tiles),
                                         jnp.asarray(ys), jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
