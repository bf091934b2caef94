"""FPN / PSPNet / Linknet decoders (smp-style) in flax.

The reference selects among Unet/FPN/PSPNet/Linknet by name through
``eval('smp.' + args.model_name)`` (train.py:29, myargs.py:9-10); here each
is an explicit module with the same macro-architecture as the
segmentation_models_pytorch defaults, consuming the deepest-first encoder
feature pyramid [c5, c4, c3, c2, c1] and emitting (B, H, W, num_classes)
float32 logits at input resolution (activation=None, logits out).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize_nearest(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b, hh, ww, c = x.shape
    if h == 2 * hh and w == 2 * ww:
        # exact 2×: nearest == pixel repetition (both torch F.interpolate
        # and jax.image.resize reduce to repeat at integer scale) — the
        # broadcast form avoids resize's gather lowering, which is
        # pathologically slow on TPU at slide scale (fast_decoder.upsample2x)
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, hh, 2, ww, 2, c))
        return x.reshape(b, h, w, c)
    return jax.image.resize(x, (b, h, w, c), method="nearest")


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="linear")


class FPNDecoder(nn.Module):
    """Feature Pyramid Network head (smp FPN defaults: pyramid 256,
    segmentation 128, merge by sum, ×4 final upsample)."""
    num_classes: int = 4
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, features, train: bool = False):
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=1e-5,
                       dtype=self.norm_dtype, param_dtype=self.param_dtype,
                       axis_name=self.axis_name if train else None)

        c5, c4, c3, c2 = [f.astype(self.dtype) for f in features[:4]]

        # lateral 1×1 + top-down pathway
        p5 = conv(self.pyramid_channels, (1, 1), name="lat5")(c5)
        p4 = conv(self.pyramid_channels, (1, 1), name="lat4")(c4) + \
            _resize_nearest(p5, c4.shape[1], c4.shape[2])
        p3 = conv(self.pyramid_channels, (1, 1), name="lat3")(c3) + \
            _resize_nearest(p4, c3.shape[1], c3.shape[2])
        p2 = conv(self.pyramid_channels, (1, 1), name="lat2")(c2) + \
            _resize_nearest(p3, c2.shape[1], c2.shape[2])

        # segmentation blocks: 3×3 conv + GN-free BN + relu, with n
        # upsamples down to the p2 (1/4) scale
        def seg_block(p, n_up, name):
            x = p
            for k in range(max(n_up, 1)):
                x = conv(self.segmentation_channels, (3, 3),
                         padding=[(1, 1), (1, 1)], use_bias=False,
                         name=f"{name}_conv{k}")(x)
                x = norm(name=f"{name}_bn{k}")(x)
                x = nn.relu(x)
                if k < n_up:
                    x = _resize_nearest(x, 2 * x.shape[1], 2 * x.shape[2])
            return x

        s5 = seg_block(p5, 3, "seg5")
        s4 = seg_block(p4, 2, "seg4")
        s3 = seg_block(p3, 1, "seg3")
        s2 = seg_block(p2, 0, "seg2")
        x = s5 + s4 + s3 + s2          # merge="add" (smp default)

        x = conv(self.num_classes, (1, 1), name="seg_head")(x)
        # ×4 back to input resolution
        x = _resize_bilinear(x, 4 * x.shape[1], 4 * x.shape[2])
        return x.astype(jnp.float32)


class PSPDecoder(nn.Module):
    """Pyramid Scene Parsing head: adaptive-pool pyramid (1, 2, 3, 6 bins)
    over the deepest feature, 1×1 conv each, upsample + concat, 3×3 fuse,
    classify, upsample to input resolution."""
    num_classes: int = 4
    bins: Sequence[int] = (1, 2, 3, 6)
    fuse_channels: int = 512
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, features, train: bool = False):
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=1e-5,
                       dtype=self.norm_dtype, param_dtype=self.param_dtype,
                       axis_name=self.axis_name if train else None)

        c5 = features[0].astype(self.dtype)
        b, h, w, c = c5.shape
        branch_ch = max(c // len(self.bins), 1)

        outs = [c5]
        for bi, nbins in enumerate(self.bins):
            if h % nbins == 0 and w % nbins == 0:
                # exact adaptive average pool (torch
                # F.adaptive_avg_pool2d semantics) via reshape-mean
                pooled = c5.astype(jnp.float32).reshape(
                    b, nbins, h // nbins, nbins, w // nbins, c
                ).mean(axis=(2, 4)).astype(self.dtype)
            else:
                # approximation for indivisible dims: antialiased resize
                pooled = jax.image.resize(
                    c5.astype(jnp.float32), (b, nbins, nbins, c),
                    method="linear", antialias=True).astype(self.dtype)
            x = conv(branch_ch, (1, 1), use_bias=False,
                     name=f"psp{bi}_conv")(pooled)
            x = norm(name=f"psp{bi}_bn")(x)
            x = nn.relu(x)
            outs.append(_resize_bilinear(x, h, w))

        x = jnp.concatenate(outs, axis=-1)
        x = conv(self.fuse_channels, (3, 3), padding=[(1, 1), (1, 1)],
                 use_bias=False, name="fuse_conv")(x)
        x = norm(name="fuse_bn")(x)
        x = nn.relu(x)
        x = conv(self.num_classes, (1, 1), name="seg_head")(x)
        x = _resize_bilinear(x, 32 * h, 32 * w)  # c5 is at /32
        return x.astype(jnp.float32)


class LinknetDecoderBlock(nn.Module):
    out_channels: int
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x, skip=None):
        in_ch = x.shape[-1]
        mid = max(in_ch // 4, 1)
        x = self.conv(mid, (1, 1), use_bias=False, name="conv1")(x)
        x = nn.relu(self.norm(name="bn1")(x))
        x = _resize_nearest(x, 2 * x.shape[1], 2 * x.shape[2])
        x = self.conv(mid, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                      name="conv2")(x)
        x = nn.relu(self.norm(name="bn2")(x))
        x = self.conv(self.out_channels, (1, 1), use_bias=False,
                      name="conv3")(x)
        x = nn.relu(self.norm(name="bn3")(x))
        if skip is not None:
            x = x + skip.astype(x.dtype)   # residual skip (Linknet)
        return x


class _S2dLinknetTailBlock(nn.Module):
    """LinknetDecoderBlock twin in an s2d cell domain (TRAIN-mode fast
    tail; exact — see unet._S2dConv/_S2dGroupBatchNorm). Two variants:

    * ``kind='s2d2'`` (block3): input x native at cell res (H/4), conv1
      1×1 native + canonical BN, up+conv2 via upfold → s2d(2), conv3 1×1
      block-diagonal; residual skip supplied as ``space_to_depth(c1)``.
    * ``kind='s2d4'`` (block4): input in s2d(2), conv1 1×1 block-diag
      s2d(2), up+conv2 via upfold2 → s2d(4), conv3 1×1 block-diag s2d(4);
      no skip.
    """
    out_channels: int
    in_channels: int
    kind: str
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, skip_s2d=None):
        from wsiseg_tpu.models.unet import _S2dConv, _S2dGroupBatchNorm

        mid = max(self.in_channels // 4, 1)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        gbn = partial(_S2dGroupBatchNorm, momentum=self.bn_momentum,
                      dtype=self.norm_dtype, param_dtype=self.param_dtype,
                      axis_name=self.axis_name)
        if self.kind == "s2d2":
            # conv1 at native cell resolution — canonical 1×1 conv + BN
            x = nn.Conv(mid, (1, 1), use_bias=False, name="conv1",
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)
            x = nn.BatchNorm(use_running_average=False,
                             momentum=self.bn_momentum, epsilon=1e-5,
                             dtype=self.norm_dtype,
                             param_dtype=self.param_dtype,
                             axis_name=self.axis_name, name="bn1")(x)
            x = nn.relu(x).astype(self.dtype)
            x = _S2dConv(mid, mid, "upfold", name="conv2", **common)(x)
            x = nn.relu(gbn(mid, 4, name="bn2")(x)).astype(self.dtype)
            x = _S2dConv(self.out_channels, mid, "diag4", name="conv3",
                         **common)(x)
            x = nn.relu(gbn(self.out_channels, 4, name="bn3")(x)
                        ).astype(self.dtype)
        elif self.kind == "s2d4":
            x = _S2dConv(mid, self.in_channels, "diag4", name="conv1",
                         **common)(x)
            x = nn.relu(gbn(mid, 4, name="bn1")(x)).astype(self.dtype)
            x = _S2dConv(mid, mid, "upfold2", name="conv2", **common)(x)
            x = nn.relu(gbn(mid, 16, name="bn2")(x)).astype(self.dtype)
            x = _S2dConv(self.out_channels, mid, "diag16", name="conv3",
                         **common)(x)
            x = nn.relu(gbn(self.out_channels, 16, name="bn3")(x)
                        ).astype(self.dtype)
        else:
            raise ValueError(f"unknown s2d tail kind {self.kind!r}")
        if skip_s2d is not None:
            x = x + skip_s2d.astype(x.dtype)
        return x


class LinknetDecoder(nn.Module):
    """Linknet: each decoder block residual-adds the encoder skip.

    Capability twin of ``smp.Linknet``'s decoder (reference train.py:29
    with myargs.py:9-10), with one deliberate divergence: the 2× upsample
    is nearest-neighbor + 3×3 conv instead of smp's ConvTranspose2d(k=4,
    s=2) — same parameter count and receptive field, but MXU-friendly
    (a transposed conv lowers to a dilated conv with 3/4 zero taps) and
    checkerboard-free. Consequence: smp Linknet DECODER checkpoints are
    not weight-importable (encoders still are, models/torch_import.py);
    torch-side parity is witnessed by an in-test replica of THIS
    structure (tests/test_torch_parity.py).

    TRAIN-mode fast tail (``s2d_tail=True``): blocks 3-4 + head execute
    in s2d cell domains with exactly transformed kernels and group-BN —
    the same lane-starvation fix as ``unet.UNetDecoder.s2d_tail`` (the
    mid=16-channel convs at H/2 and H dominate the Linknet train step;
    measured 253 p/s vs Unet's 367 at b32, scripts/exp_r4i.py). Param and
    stat trees are IDENTICAL to the native decoder, so checkpoints
    interoperate freely."""
    # input dims must divide this for the train s2d tail to engage
    # (emits_s2d: c1 at H/2 needs even dims); add_s2d_seg_labels gates
    # host-side label packing on it — keep the two in sync HERE
    S2D_LABEL_DIV = 4

    num_classes: int = 4
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None
    s2d_tail: bool = False    # train-mode cell-domain blocks 3-4 + head
    s2d_logits: bool = False  # with s2d_tail: emit s2d(4)-layout logits

    def emits_s2d(self, features, train: bool) -> bool:
        """True when the train s2d tail applies to this feature pyramid
        (the __call__ branch condition, single source of truth)."""
        c1 = features[4] if len(features) > 4 else None
        return bool(self.s2d_tail and train and len(features) == 5
                    and c1 is not None
                    and c1.shape[1] % 2 == 0 and c1.shape[2] % 2 == 0)

    def emits_s2d_logits(self, features, train: bool) -> bool:
        return self.s2d_logits and self.emits_s2d(features, train)

    @nn.compact
    def __call__(self, features, train: bool = False):
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=1e-5,
                       dtype=self.norm_dtype, param_dtype=self.param_dtype,
                       axis_name=self.axis_name if train else None)

        x = features[0].astype(self.dtype)
        skips = list(features[1:]) + [None]
        use_s2d = self.emits_s2d(features, train)
        n_native = 3 if use_s2d else len(skips)
        for i, skip in enumerate(skips[:n_native]):
            out_ch = skip.shape[-1] if skip is not None else 32
            x = LinknetDecoderBlock(out_ch, conv=conv, norm=norm,
                                    name=f"block{i}")(x, skip)
        if use_s2d:
            from wsiseg_tpu.models.fast_decoder import (depth_to_space,
                                                        space_to_depth)
            from wsiseg_tpu.models.unet import _S2dConv
            c1 = features[4]
            common = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                          norm_dtype=self.norm_dtype,
                          bn_momentum=self.bn_momentum,
                          axis_name=self.axis_name)
            x = _S2dLinknetTailBlock(
                c1.shape[-1], x.shape[-1], "s2d2", name="block3",
                **common)(x, space_to_depth(c1.astype(self.dtype)))
            x = _S2dLinknetTailBlock(32, c1.shape[-1], "s2d4",
                                     name="block4", **common)(x)
            x = _S2dConv(self.num_classes, 32, "s2d4", use_bias=True,
                         bias_tile=16, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="seg_head")(x)
            if self.s2d_logits:
                return x.astype(jnp.float32)
            return depth_to_space(x, 4).astype(jnp.float32)
        x = conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                 name="seg_head")(x)
        return x.astype(jnp.float32)
