"""Hybrid data × SPATIAL parallel training over a (2, 4) CPU mesh.

Each device owns a horizontal stripe of every tile (the train-side analog
of the row-sharded inference canvas, SURVEY.md §5); GSPMD inserts the
convolution halo exchanges and keeps BatchNorm/loss reductions global. The
reference has no multi-device support at all (SURVEY.md §2.c).

What can be asserted tightly: the FORWARD is exact under sharding (losses
and updated BatchNorm statistics match single-device to fp-noise). The
backward is the same global computation, but a full-depth randomly
initialized ResNet's f32 gradients are genuinely ill-conditioned: the
single-device f32 grads themselves differ from an f64 oracle by up to
~1e-1 relative at layer2 (measured, scripts-level probe /tmp/debug_min8 of
round 3), and reassociating the reductions across devices moves within
that same envelope. So the trajectory test checks agreement at the
conditioning level, not bit-exactness.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.config import default_config
from wsiseg_tpu.models.ynet import init_ynet
from wsiseg_tpu.optim import build_optimizer
from wsiseg_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                      shard_batch_spatial)
from wsiseg_tpu.train.loop import Trainer
from wsiseg_tpu.train.state import TrainState
from wsiseg_tpu.train.steps import make_hybrid_train_step

TILE = 32      # %8 == 0 → the s2d tail + s2d loss run under sharding
BATCH = 4
N_BATCHES = 2


def _batch(rng):
    return {
        "image": rng.randn(BATCH, TILE, TILE, 3).astype(np.float32),
        "seg_label": rng.randint(0, 4, (BATCH, TILE, TILE))
        .astype(np.int32),
        "cls_label": rng.randint(0, 4, (BATCH,)).astype(np.int32),
        "reg_label": rng.rand(BATCH).astype(np.float32),
        "is_cls": np.tile([1.0, 0.0], BATCH // 2).astype(np.float32),
        "is_reg": np.tile([0.0, 1.0], BATCH // 2).astype(np.float32),
        "is_seg": np.tile([1.0, 1.0], BATCH // 2).astype(np.float32),
    }


def _batches(seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(N_BATCHES):
        yield _batch(rng)


def _mesh():
    return make_mesh(devices=jax.devices(), shape=(2, 4),
                     axes=("data", "space"))


def test_spatial_step_forward_exact():
    """One hybrid step: losses and updated BN statistics match the
    single-device step to fp noise (the forward and the stat reductions
    are exact under (data, space) sharding)."""
    assert jax.device_count() == 8
    from wsiseg_tpu.data.patches import add_s2d_seg_labels
    cfg = default_config(tile_w=TILE, tile_h=TILE, batch_size=BATCH,
                         compute_dtype="float32", lr=1e-3, optim="sgd",
                         save_models=0, validate_model=0)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0),
                                 tile_hw=(TILE, TILE))
    tx = build_optimizer(cfg)
    batch = add_s2d_seg_labels(_batch(np.random.RandomState(0)), cfg)
    mesh = _mesh()
    out = {}
    for name in ("single", "spatial"):
        step = jax.jit(make_hybrid_train_step(model, tx, cfg))
        st = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, variables), tx)
        b = batch
        if name == "spatial":
            st = replicate_tree(mesh, st)
            b = shard_batch_spatial(mesh, b)
        st, m = step(st, b, jax.random.PRNGKey(1))
        out[name] = (m, st.batch_stats)
    for k in ("loss", "loss_cls", "loss_reg", "loss_seg"):
        np.testing.assert_allclose(float(out["spatial"][0][k]),
                                   float(out["single"][0][k]),
                                   rtol=1e-4, err_msg=k)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(out["single"][1]),
            jax.tree_util.tree_leaves_with_path(out["spatial"][1])):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-4, err_msg=str(pa))


def test_spatial_training_trajectory():
    """Trainer epoch on the (2,4) mesh: the wired path (state replication,
    per-key spatial sharding in the prefetch thread, GSPMD step) runs and
    tracks single-device training within the f32 gradient-conditioning
    envelope (see module docstring — bit-exactness is not attainable for
    the backward of an untrained full-depth ResNet)."""
    assert jax.device_count() == 8

    def run(mesh):
        cfg = default_config(tile_w=TILE, tile_h=TILE, batch_size=BATCH,
                             compute_dtype="float32", lr=1e-3, optim="sgd",
                             save_models=0, validate_model=0)
        model, variables = init_ynet(cfg, jax.random.PRNGKey(0),
                                     tile_hw=(TILE, TILE))
        tx = build_optimizer(cfg)
        state = TrainState.create(variables, tx)
        step = jax.jit(make_hybrid_train_step(model, tx, cfg))
        tr = Trainer(cfg, state, step, make_batches=_batches,
                     log_fn=lambda m: None, mesh=mesh)
        tr.run(start_epoch=1, num_epochs=1)
        return tr

    tr_one = run(None)
    tr_sp = run(_mesh())
    for k in ("loss", "loss_cls", "loss_reg", "loss_seg"):
        a, b = tr_sp.history[0][k], tr_one.history[0][k]
        assert np.isfinite(a) and np.isfinite(b)
        np.testing.assert_allclose(a, b, rtol=5e-2, err_msg=k)


def test_shard_batch_spatial_layouts():
    mesh = _mesh()
    b = next(_batches())
    from wsiseg_tpu.data.patches import add_s2d_seg_labels
    cfg = default_config(tile_w=TILE, tile_h=TILE)
    b = add_s2d_seg_labels(b, cfg)
    assert "seg_label_s2d" in b
    staged = shard_batch_spatial(mesh, b)
    assert staged["image"].sharding.spec == ("data", "space")
    assert staged["seg_label_s2d"].sharding.spec == ("data", "space")
    assert staged["is_seg"].sharding.spec == ("data",)
    # indivisible height fails loudly
    bad = dict(b, image=np.zeros((BATCH, 30, TILE, 3), np.float32))
    try:
        shard_batch_spatial(mesh, bad)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_make_train_mesh_spatial_flag():
    from wsiseg_tpu.cli.common import make_train_mesh
    cfg = default_config(mesh="2x4")
    m = make_train_mesh(cfg)
    assert m is not None and dict(m.shape) == {"data": 2, "space": 4}
    assert make_train_mesh(default_config(mesh="1x1")) is None
