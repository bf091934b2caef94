"""U-Net decoder (smp-style) in flax.

Matches the decoder the reference builds via ``smp.Unet`` (train.py:29):
five upsample blocks with decoder channels (256, 128, 64, 32, 16), each
2× nearest upsample → concat encoder skip → two 3×3 conv+BN+relu; final
3×3 conv to ``num_classes`` logits at input resolution (activation=None —
the reference passes a None-returning activation, train.py:27-28).
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


class UNetDecoder(nn.Module):
    num_classes: int = 4
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

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
        for i, (ch, skip) in enumerate(zip(self.decoder_channels, skips)):
            x = DecoderBlock(ch, conv=conv, norm=norm, name=f"block{i}")(x, skip)

        x = conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                 name="seg_head")(x)
        return x.astype(jnp.float32)
