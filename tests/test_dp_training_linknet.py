"""Linknet train s2d tail under the 8-CPU DP mesh: ONE sgd step must be
the same global computation as single-device — loss, updated params, and
BN running stats all match tightly.

One step, not a trajectory: single-vs-mesh is two reduction ORDERS of one
computation, and an untrained net's loss landscape amplifies that f32
noise chaotically across steps (measured: step-wise rel diff 1.3e-6 →
5.8e-5 → 1.0e-2 over 3 sgd steps for Linknet, while step 1 is exact; Unet
stays ≤2e-5 only because its tail's backward is better conditioned). sgd,
not adam: adam's rsqrt amplifies the noise unboundedly near v≈0
(CLAUDE.md convention).
"""

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data.patches import add_s2d_seg_labels
from wsiseg_tpu.models.ynet import init_ynet
from wsiseg_tpu.optim import build_optimizer
from wsiseg_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from wsiseg_tpu.train.state import TrainState
from wsiseg_tpu.train.steps import make_hybrid_train_step

TILE, BATCH = 32, 8


def _batch():
    rng = np.random.RandomState(0)
    return {
        "image": rng.randn(BATCH, TILE, TILE, 3).astype(np.float32),
        "seg_label": rng.randint(0, 4, (BATCH, TILE, TILE)).astype(np.int32),
        "cls_label": rng.randint(0, 4, (BATCH,)).astype(np.int32),
        "reg_label": rng.rand(BATCH).astype(np.float32),
        "is_cls": np.tile([1.0, 0.0, 0.0, 0.0], BATCH // 4).astype(np.float32),
        "is_reg": np.tile([0.0, 1.0, 0.0, 0.0], BATCH // 4).astype(np.float32),
        "is_seg": np.tile([0.0, 0.0, 1.0, 1.0], BATCH // 4).astype(np.float32),
    }


def test_one_step_matches_single_device():
    assert jax.device_count() == 8
    cfg = default_config(tile_w=TILE, tile_h=TILE, batch_size=BATCH,
                         compute_dtype="float32", lr=1e-3, optim="sgd",
                         model_name="Linknet",
                         save_models=0, validate_model=0)
    assert cfg.train_s2d_tail
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0),
                                 tile_hw=(TILE, TILE))
    tx = build_optimizer(cfg)
    step = jax.jit(make_hybrid_train_step(model, tx, cfg))
    batch = {k: jnp.asarray(v)
             for k, v in add_s2d_seg_labels(_batch(), cfg).items()}
    assert "seg_label_s2d" in batch      # s2d loss path active under mesh
    rng = jax.random.PRNGKey(1)

    st1, m1 = step(TrainState.create(variables, tx), batch, rng)

    mesh = make_mesh(devices=jax.devices(), shape=(8,), axes=("data",))
    st_r = replicate_tree(mesh, TrainState.create(variables, tx))
    st8, m8 = step(st_r, shard_batch(mesh, batch), rng)

    for k in ("loss", "loss_cls", "loss_reg", "loss_seg"):
        np.testing.assert_allclose(float(m8[k]), float(m1[k]), rtol=1e-5,
                                   err_msg=k)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                {"p": st1.params, "s": st1.batch_stats}),
            jax.tree_util.tree_leaves_with_path(
                {"p": st8.params, "s": st8.batch_stats})):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=2e-6, err_msg=str(pa))
