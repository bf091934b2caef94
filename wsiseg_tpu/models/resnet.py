"""ResNet encoders in flax (NHWC, bf16 compute / f32 params).

Architecture-equivalent to the torchvision ResNets the reference uses as smp
encoders (train.py:29 ``smp.Unet('resnet18', imagenet)``) and as the vendored
multi-patch trunk (resnets_shift.py:111-187): 7×7/2 stem, 3×3/2 max-pool,
four stages of Basic/Bottleneck blocks. Returns the feature pyramid
deepest-first, mirroring smp ``encoder.out_shapes`` where index 0 is the
deepest stage (the reference's heads consume ``encoding[0]``,
train_cellularity.py:87).

Module/parameter names are chosen so torchvision state_dicts map 1:1 in
``wsiseg_tpu.models.torch_import`` (conv1 → stem_conv, layer{i}.{j} →
layer{i}_{j}, downsample.* → down_conv/down_bn).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if identity.shape != y.shape:
            identity = self.conv(self.filters, (1, 1),
                                 (self.strides, self.strides),
                                 use_bias=False, name="down_conv")(x)
            identity = self.norm(name="down_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        y = self.conv(self.filters, (1, 1), use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.filters * self.expansion, (1, 1), use_bias=False,
                      name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if identity.shape != y.shape:
            identity = self.conv(self.filters * self.expansion, (1, 1),
                                 (self.strides, self.strides),
                                 use_bias=False, name="down_conv")(x)
            identity = self.norm(name="down_bn")(identity)
        return nn.relu(y + identity)


# encoder name → (block class, stage sizes); channels follow torchvision.
ENCODER_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
    "resnet152": (Bottleneck, (3, 8, 36, 3)),
}


def encoder_out_channels(arch: str) -> Tuple[int, ...]:
    """Deepest-first channel counts of the returned pyramid (smp out_shapes)."""
    block, _ = ENCODER_SPECS[arch]
    e = block.expansion
    return (512 * e, 256 * e, 128 * e, 64 * e, 64)


class ResNetEncoder(nn.Module):
    """Returns [c5, c4, c3, c2, c1]: strides /32, /16, /8, /4, /2."""
    arch: str = "resnet18"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None  # set for cross-device BN-stat sync

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stages = ENCODER_SPECS[self.arch]
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=1e-5,
                       dtype=self.norm_dtype, param_dtype=self.param_dtype,
                       axis_name=self.axis_name if train else None)

        x = x.astype(self.dtype)
        x = conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                 use_bias=False, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        c1 = nn.relu(x)                                  # /2, 64ch

        x = nn.max_pool(c1, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        filters = (64, 128, 256, 512)
        for i, (n_blocks, f) in enumerate(zip(stages, filters)):
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = block_cls(f, strides=strides, conv=conv, norm=norm,
                              name=f"layer{i + 1}_{j}")(x)
            feats.append(x)                              # /4, /8, /16, /32

        c2, c3, c4, c5 = feats
        return [c5, c4, c3, c2, c1]
