"""Functional s2d-stem encoder (models/fast_encoder): exact parity with the
flax encoder. (Not wired into the engine — see module docstring — but the
weight transform and functional BN must stay correct.)"""

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.config import default_config
from wsiseg_tpu.models.fast_encoder import (resnet_encode_fast,
                                            s2d_stem_kernel,
                                            supports_fast_encode)
from wsiseg_tpu.models.ynet import YNet, init_ynet


def test_s2d_stem_kernel_exact(rng):
    """7×7/2 conv == 4×4/1 conv over s2d(2) input with transformed weights."""
    from wsiseg_tpu.models.fast_decoder import space_to_depth

    x = jnp.asarray(rng.randn(1, 32, 40, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 8).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fast = jax.lax.conv_general_dilated(
        space_to_depth(x), s2d_stem_kernel(w), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast),
                               atol=1e-4, rtol=1e-4)


def test_encoder_parity(rng):
    cfg = default_config(tile_w=64, tile_h=64, compute_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    assert supports_fast_encode(model)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    ref = jax.jit(lambda v, a: model.apply(v, a, method=YNet.encode))(
        variables, x)
    fast = jax.jit(lambda v, a: resnet_encode_fast(model, v, a))(variables, x)
    for r, f in zip(ref, fast):
        assert r.shape == f.shape
        np.testing.assert_allclose(np.asarray(r), np.asarray(f),
                                   atol=1e-3, rtol=1e-3)


def test_encode_stages_fold_parity(rng):
    """Layer-1 conv-chain encoder (encode_stages_fold) matches
    encode_stages (interpret mode on CPU)."""
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.fast_encoder import (encode_stages,
                                                encode_stages_fold)
    from wsiseg_tpu.models.resnet import ENCODER_SPECS
    from wsiseg_tpu.models.ynet import init_ynet
    cfg = default_config(tile_w=64, tile_h=64, compute_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(3))
    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    _, stages = ENCODER_SPECS[model.arch]
    # c1 is a stem output in every real call → post-ReLU, non-negative
    # (encode_stages' resfold layer1 relies on it)
    c1 = jnp.asarray(np.abs(rng.randn(1, 32, 32, 64)).astype(np.float32))
    ref = encode_stages(ep, eb, c1, stages, jnp.float32)
    got = encode_stages_fold(ep, eb, c1, stages, jnp.float32, br=8, wc=16,
                             interpret=True)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_maxpool_s2d_matches_reduce_window(rng):
    import flax.linen as nn
    from wsiseg_tpu.models.fast_encoder import maxpool_s2d
    x = jnp.asarray(rng.randn(2, 16, 24, 5).astype(np.float32))
    ref = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
    got = maxpool_s2d(x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_maxpool_strided_matches_reduce_window(rng):
    import flax.linen as nn
    from wsiseg_tpu.models.fast_encoder import maxpool_strided
    x = jnp.asarray(rng.randn(2, 16, 24, 5).astype(np.float32))
    ref = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
    np.testing.assert_array_equal(np.asarray(ref),
                                  np.asarray(maxpool_strided(x)))
