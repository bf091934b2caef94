"""Oracle tests for the fused Pallas 3×3 conv kernels (ops/conv9).

Run in Pallas interpret mode on CPU; shapes are small but exercise
spatial padding (non-multiple dims), channel lane-padding (Cin < 128),
and the chain kernel's inter-layer border re-zeroing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsiseg_tpu.ops.conv9 import conv9, conv9_ref, conv_chain


def _mk(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


@pytest.mark.parametrize("h,w,cin,cout", [
    (16, 32, 8, 16),      # tiny, lane-padded
    (19, 45, 3, 4),       # non-multiple dims
    (24, 48, 128, 32),    # full-lane input
])
def test_conv9_matches_xla(h, w, cin, cout):
    rng = np.random.RandomState(0)
    x = _mk(rng, h, w, cin).astype(jnp.bfloat16)
    k = _mk(rng, 3, 3, cin, cout) * 0.1
    s = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
    b = _mk(rng, cout)
    got = conv9(x, k, s, b, relu=True, br=8, wc=16, interpret=True)
    want = conv9_ref(x, k, s, b, relu=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.15, rtol=0.05)


@pytest.mark.parametrize("dims", [(16, 32), (21, 41)])
def test_conv_chain_matches_layered(dims):
    h, w = dims
    rng = np.random.RandomState(1)
    chans = [8, 16, 8, 4]
    x = _mk(rng, h, w, chans[0]).astype(jnp.bfloat16)
    layers = []
    for ci, co in zip(chans[:-1], chans[1:]):
        k = _mk(rng, 3, 3, ci, co) * 0.2
        s = jnp.asarray(rng.rand(co).astype(np.float32) + 0.5)
        b = _mk(rng, co)
        layers.append((k, s, b, True))
    layers[-1] = (layers[-1][0], None, layers[-1][2], False)

    got = conv_chain(x, layers, br=8, wc=16, interpret=True)

    # oracle: XLA conv per layer with bf16 intermediate casts (the chain's
    # numerics), including per-layer SAME zero padding at the image border
    y = x
    for (k, s, b, relu) in layers:
        y = conv9_ref(y, k, s, b, relu=relu).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(y, np.float32),
                               atol=0.25, rtol=0.05)


def test_conv_chain_single_layer_equals_conv9():
    rng = np.random.RandomState(2)
    x = _mk(rng, 16, 24, 8).astype(jnp.bfloat16)
    k = _mk(rng, 3, 3, 8, 8) * 0.2
    b = _mk(rng, 8)
    got = conv_chain(x, [(k, None, b, True)], br=8, wc=8, interpret=True)
    want = conv9(x, k, None, b, relu=True, br=8, wc=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-2, rtol=1e-2)


def test_conv_chain_edges_mask_exact():
    """Gated edge-strip masking ("edges") equals the value-mask path on a
    geometry that allows it (h % br == 0, power-of-two split of w)."""
    rng = np.random.RandomState(3)
    h, w = 16, 272
    chans = [8, 16, 8]
    x = _mk(rng, h, w, chans[0]).astype(jnp.bfloat16)
    layers = []
    for ci, co in zip(chans[:-1], chans[1:]):
        layers.append((_mk(rng, 3, 3, ci, co) * 0.2, None,
                       _mk(rng, co), True))
    full = conv_chain(x, layers, br=8, wc=136, mask_mode="full",
                      interpret=True)
    edges = conv_chain(x, layers, br=8, wc=136, mask_mode="edges",
                       interpret=True)
    np.testing.assert_allclose(np.asarray(edges, np.float32),
                               np.asarray(full, np.float32),
                               atol=1e-2, rtol=1e-2)


def test_conv_chain_planar_out():
    """planar_out=True returns (C, H, W) == transpose of the NHWC result
    (interpret mode; the TPU lowering of the in-kernel transpose is a
    documented compile-time negative — see the module docstring)."""
    rng = np.random.RandomState(4)
    x = _mk(rng, 16, 256, 8).astype(jnp.bfloat16)
    layers = [(_mk(rng, 3, 3, 8, 8) * 0.2, None, _mk(rng, 8), True)]
    nhwc = conv_chain(x, layers, br=8, wc=128, interpret=True)
    planar = conv_chain(x, layers, br=8, wc=128, planar_out=True,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(planar, np.float32),
                               np.asarray(nhwc, np.float32
                                          ).transpose(2, 0, 1),
                               atol=1e-2, rtol=1e-2)


def test_conv_chain_rejects_halo_deeper_than_block():
    """The edges-mode bottom masking assumes halo depth L-1 <= br; a
    deeper chain must fail loudly (advisor finding: silent border
    corruption otherwise)."""
    rng = np.random.RandomState(5)
    x = _mk(rng, 32, 32, 8).astype(jnp.bfloat16)
    layers = [(_mk(rng, 3, 3, 8, 8) * 0.2, None, None, True)
              for _ in range(4)]
    with pytest.raises(ValueError, match="halo depth"):
        conv_chain(x, layers, br=2, wc=16, interpret=True)
