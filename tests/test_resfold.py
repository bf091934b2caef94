"""Residual-folded layer1 blocks (fast_encoder._basic_block_resfold):
exact parity with the plain BasicBlock on non-negative inputs."""

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.config import default_config
from wsiseg_tpu.models.fast_encoder import (_basic_block,
                                            _basic_block_resfold,
                                            encode_stages)
from wsiseg_tpu.models.ynet import YNet, init_ynet


def test_resfold_block_parity(rng):
    cfg = default_config(tile_w=32, tile_h=32, compute_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    x = jnp.asarray(np.abs(rng.randn(1, 16, 24, 64)).astype(np.float32))
    for j in (0, 1):
        ref = _basic_block(ep, eb, x, 0, j, 1, jnp.float32)
        got = _basic_block_resfold(ep, eb, x, 0, j, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_encode_stages_matches_flax(rng):
    """encode_stages (maxpool_s2d + resfold layer1) still equals the flax
    encoder stages end-to-end."""
    from wsiseg_tpu.models.resnet import ENCODER_SPECS

    cfg = default_config(tile_w=64, tile_h=64, compute_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(1))
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    ref = model.apply(variables, x, method=YNet.encode)

    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    _, stages = ENCODER_SPECS[model.arch]
    got = encode_stages(ep, eb, ref[4], stages, jnp.float32)
    for a, b in zip(got[:4], ref[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)
