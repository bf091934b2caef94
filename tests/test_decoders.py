"""FPN / PSPNet / Linknet decoder families (models/decoders)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsiseg_tpu.config import default_config
from wsiseg_tpu.models.ynet import YNet, init_ynet

TILE = 64


@pytest.mark.parametrize("name", ["FPN", "PSPNet", "Linknet"])
def test_decoder_shapes_and_grads(name):
    cfg = default_config(model_name=name, tile_w=TILE, tile_h=TILE,
                         compute_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, TILE, TILE, 3),
                    jnp.float32)
    seg = jax.jit(lambda v, x: model.apply(v, x, method=YNet.segment))(
        variables, x)
    assert seg.shape == (2, TILE, TILE, 4)
    assert seg.dtype == jnp.float32
    assert np.isfinite(np.asarray(seg)).all()

    # gradient flows through the decoder
    def loss(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          x, method=YNet.segment)
        return jnp.mean(out ** 2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_unknown_decoder_rejected():
    cfg = default_config(tile_w=TILE, tile_h=TILE, compute_dtype="float32")
    with pytest.raises(ValueError):
        cfg.replace(model_name="SegFormer")


@pytest.mark.parametrize("arch", ["resnet34", "resnet50"])
def test_ynet_alt_encoders_segment(arch):
    """Full Y-Net forward for the non-default encoder archs (Bottleneck
    included) — pyramid channel wiring must hold through the decoder."""
    cfg = default_config(arch_encoder=arch, tile_w=TILE, tile_h=TILE,
                         compute_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((1, TILE, TILE, 3), jnp.float32)
    out = jax.jit(lambda v, a: model.apply(v, a))(variables, x)
    assert out["seg"].shape == (1, TILE, TILE, 4)
    assert out["cls"].shape == (1, 4)
    assert out["reg"].shape == (1, 1)
