"""U-Net decoder (smp-style) in flax.

Matches the decoder the reference builds via ``smp.Unet`` (train.py:29):
five upsample blocks with decoder channels (256, 128, 64, 32, 16), each
2× nearest upsample → concat encoder skip → two 3×3 conv+BN+relu; final
3×3 conv to ``num_classes`` logits at input resolution (activation=None —
the reference passes a None-returning activation, train.py:27-28).

TRAIN-mode fast tail (``s2d_tail=True``): blocks 2-4 + head execute in
space-to-depth cell domains with exactly transformed kernels — the same
trick the inference engine uses (``fast_decoder.decode_cells``), made
differentiable and BN-stat-exact so it is safe inside ``jax.grad``. The
16/32-channel convs at ≥256² spatial are the lane-starved hot spot of the
training step (measured v5e, scripts/exp_r4b.py: blocks 3+4+head are
~142 ms of the 217 ms b32 grad); in the s2d domain they run with 128-256
dense lanes. Parameter/stat trees are IDENTICAL to the native decoder
(same names, logical shapes), so checkpoints interoperate freely.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class DecoderBlock(nn.Module):
    filters: int
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x, skip=None):
        x = _upsample2x(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, name="conv1")(x)
        x = self.norm(name="bn1")(x)
        x = nn.relu(x)
        x = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, name="conv2")(x)
        x = self.norm(name="bn2")(x)
        return nn.relu(x)


class _S2dGroupBatchNorm(nn.Module):
    """``nn.BatchNorm`` over LOGICAL channels C, applied to an s2d(f)-layout
    tensor (..., f²·C). Param/stat-compatible (scale/bias (C,), running
    mean/var (C,)); train stats pool the f² sub-position lane groups — the
    s2d permutation only reorders the pooled population, so the statistics
    (and therefore outputs, running updates and gradients) are EXACTLY the
    canonical per-channel BatchNorm's."""
    features: int
    f2: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: str | None = None
    # output dtype (flax BatchNorm's ``dtype``); statistics are ALWAYS f32
    # (flax does the same — `force_float32_reductions`). With bf16 the
    # normalization here stays f32 and only the STORED result is bf16, so
    # it is a hair more accurate than flax's bf16 arithmetic. The module is
    # TRAIN-ONLY (batch statistics, no running-average read path): the s2d
    # tail is unreachable at eval time, where the canonical decoder (or the
    # engine fast paths) runs instead.
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32       # scale/bias, like nn.BatchNorm;
    #                                      running stats stay f32 (flax's
    #                                      force_float32_reductions default)

    @nn.compact
    def __call__(self, x):
        c, f2 = self.features, self.f2
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        xf = x.astype(jnp.float32)
        red = tuple(range(x.ndim - 1))
        xr = xf.reshape(*x.shape[:-1], f2, c)
        mean = jnp.mean(xr, axis=red + (x.ndim - 1,))
        mean2 = jnp.mean(jnp.square(xr), axis=red + (x.ndim - 1,))
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)

        inv = (jax.lax.rsqrt(var + self.epsilon)
               * scale.astype(jnp.float32))
        y = (xf * jnp.tile(inv, f2)
             + jnp.tile(bias.astype(jnp.float32) - mean * inv, f2))
        return y.astype(self.dtype)


class _S2dConv(nn.Module):
    """``nn.Conv``-compatible params (kernel (kh,kw,Cin,Cout)[, bias
    (Cout,)]), executed with an exact s2d-domain kernel transform
    (fast_decoder.{upfold,s2d,upfold2}_kernel / _block_diag_1x1)."""
    features: int
    in_features: int
    transform: str            # 'upfold_cat' | 'upfold' | 's2d2' | 'upfold2'
    #                           | 's2d4' | 'diag4' | 'diag16'
    split: int = 0            # 'upfold_cat': logical channels on the up path
    use_bias: bool = False
    bias_tile: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from wsiseg_tpu.models.fast_decoder import (_block_diag_1x1,
                                                    s2d_kernel, s2d_kernel_f,
                                                    upfold2_kernel,
                                                    upfold_kernel)
        ksz = 1 if self.transform.startswith("diag") else 3
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (ksz, ksz, self.in_features, self.features),
                            self.param_dtype)
        pad = [(1, 1), (1, 1)]
        if self.transform == "upfold":
            k = upfold_kernel(kernel)
        elif self.transform in ("diag4", "diag16"):
            # 1×1 conv applied in s2d(f) layout: exact block-diagonal
            # kernel kron(I_f², w); no spatial support → VALID padding
            k = _block_diag_1x1(kernel, int(self.transform[4:]))
            pad = [(0, 0), (0, 0)]
        elif self.transform == "upfold_cat":
            k = jnp.concatenate([upfold_kernel(kernel[:, :, :self.split]),
                                 s2d_kernel(kernel[:, :, self.split:])],
                                axis=2)
        elif self.transform == "s2d2":
            k = s2d_kernel(kernel)
        elif self.transform == "upfold2":
            k = upfold2_kernel(kernel)
        elif self.transform == "s2d4":
            k = s2d_kernel_f(kernel, 4)
        else:
            raise ValueError(self.transform)
        # output in the compute dtype (matching nn.Conv) so the grad
        # transpose sees consistent dtypes; BN upcasts to f32 right after
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype), (1, 1),
            pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype)
            y = y + jnp.tile(b.astype(jnp.float32), self.bias_tile)
        return y


class _S2dTailBlock(nn.Module):
    """DecoderBlock twin running in an s2d cell domain. Two variants:

    * ``kind='s2d2'``: input x at cell res (native layout), skip supplied
      in s2d(2) layout; conv1 = upfold(up path) ⊕ s2d(skip), output s2d(2)
      (decoder blocks 2 and 3).
    * ``kind='s2d4'``: input in s2d(2) (no skip); conv1 = upfold2 into
      s2d(4), conv2 = s2d(4) kernel (decoder block 4).
    """
    filters: int
    in_features: int          # logical conv1 input channels
    kind: str
    split: int = 0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, skip_s2d=None):
        f2 = 4 if self.kind == "s2d2" else 16
        t1 = "upfold_cat" if self.kind == "s2d2" else "upfold2"
        t2 = "s2d2" if self.kind == "s2d2" else "s2d4"
        if skip_s2d is not None:
            x = jnp.concatenate([x, skip_s2d.astype(x.dtype)], axis=-1)
        x = _S2dConv(self.filters, self.in_features, t1, split=self.split,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="conv1")(x)
        x = _S2dGroupBatchNorm(self.filters, f2, momentum=self.bn_momentum,
                               dtype=self.norm_dtype,
                               param_dtype=self.param_dtype,
                               axis_name=self.axis_name, name="bn1")(x)
        x = nn.relu(x).astype(self.dtype)
        x = _S2dConv(self.filters, self.filters, t2, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="conv2")(x)
        x = _S2dGroupBatchNorm(self.filters, f2, momentum=self.bn_momentum,
                               dtype=self.norm_dtype,
                               param_dtype=self.param_dtype,
                               axis_name=self.axis_name, name="bn2")(x)
        return nn.relu(x).astype(self.dtype)


class UNetDecoder(nn.Module):
    # input dims must divide this for the train s2d tail to engage (the
    # emits_s2d c1/c2 conditions); data/patches.add_s2d_seg_labels gates
    # host-side label packing on it — keep the two in sync HERE
    S2D_LABEL_DIV = 8

    num_classes: int = 4
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None
    s2d_tail: bool = False    # train-mode cell-domain blocks 2-4 + head
    s2d_logits: bool = False  # with s2d_tail: return head logits in s2d(4)
                              # layout (B, H/4, W/4, 16·nc) — callers pair
                              # them with losses.cross_entropy_s2d; equal to
                              # depth_to_space(out, 4) by construction

    def emits_s2d(self, features, train: bool) -> bool:
        """True when the train s2d tail applies to this feature pyramid
        (the __call__ branch condition, kept as the single source of
        truth)."""
        c1 = features[4] if len(features) > 4 else None
        c2 = features[3] if len(features) > 3 else None
        return bool(self.s2d_tail and train
                    and len(self.decoder_channels) == 5 and c1 is not None
                    and c1.shape[1] % 4 == 0 and c1.shape[2] % 4 == 0
                    and c2.shape[1] % 2 == 0 and c2.shape[2] % 2 == 0)

    def emits_s2d_logits(self, features, train: bool) -> bool:
        """True when __call__ will RETURN s2d(4)-layout logits — callers
        (models/ynet.py) tag the output for losses.cross_entropy_s2d from
        this, never from output-shape pattern matching."""
        return self.s2d_logits and self.emits_s2d(features, train)

    @nn.compact
    def __call__(self, features, train: bool = False):
        """features: deepest-first pyramid [c5, c4, c3, c2, c1] from the
        encoder (/32.../2). Output: (B, H, W, num_classes) float32 logits."""
        from wsiseg_tpu.models.fastconv import decoder_conv_factory
        conv = decoder_conv_factory(
            partial(nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype),
            self.dtype, self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=1e-5,
                       dtype=self.norm_dtype, param_dtype=self.param_dtype,
                       axis_name=self.axis_name if train else None)

        x = features[0].astype(self.dtype)
        skips = list(features[1:]) + [None]  # c4, c3, c2, c1, then no skip
        use_s2d = self.emits_s2d(features, train)
        c1 = features[4] if use_s2d else None
        c2 = features[3] if use_s2d else None
        n_native = 2 if use_s2d else len(self.decoder_channels)
        for i, (ch, skip) in enumerate(
                zip(self.decoder_channels[:n_native], skips)):
            x = DecoderBlock(ch, conv=conv, norm=norm, name=f"block{i}")(x, skip)

        if use_s2d:
            from wsiseg_tpu.models.fast_decoder import (depth_to_space,
                                                        space_to_depth)
            common = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                          norm_dtype=self.norm_dtype,
                          bn_momentum=self.bn_momentum,
                          axis_name=self.axis_name)
            ch2, ch3, ch4 = self.decoder_channels[2:]
            # block2 in s2d(2) of its H/4 domain (mirrors the inference
            # decode_cells chain), back to native for block3's upfold
            x = _S2dTailBlock(ch2, x.shape[-1] + c2.shape[-1], "s2d2",
                              split=x.shape[-1], name="block2",
                              **common)(x, space_to_depth(c2.astype(self.dtype)))
            x = depth_to_space(x, 2)
            x = _S2dTailBlock(ch3, x.shape[-1] + c1.shape[-1], "s2d2",
                              split=x.shape[-1], name="block3",
                              **common)(x, space_to_depth(c1.astype(self.dtype)))
            x = _S2dTailBlock(ch4, ch3, "s2d4", name="block4", **common)(x)
            x = _S2dConv(self.num_classes, ch4, "s2d4", use_bias=True,
                         bias_tile=16, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="seg_head")(x)
            if self.s2d_logits:
                return x.astype(jnp.float32)
            return depth_to_space(x, 4).astype(jnp.float32)

        x = conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                 name="seg_head")(x)
        return x.astype(jnp.float32)
