"""Multi-patch region-ensemble ResNet.

Capability twin of the reference's vendored ``resnets_shift.ResNet``
(resnets_shift.py:111-217): input is (B, P, H, W, C) — P patches sampled
from one region — classified per-patch (``fc0``) and jointly over the
concatenation of all P trunk features (``fc``).

TPU-native difference: the reference loops over P in Python, running P
separate trunk forwards (resnets_shift.py:194-212). Here patches fold into
the batch axis — one (B·P, H, W, C) forward — which keeps the MXU busy with
one large convolution stream instead of P small ones.

Per-patch logits return as (B, P, num_classes); the reference returns the
same values concatenated patch-major as (P·B, C) (resnets_shift.py:217).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from wsiseg_tpu.models.resnet import ResNetEncoder, ENCODER_SPECS


class MultiPatchResNet(nn.Module):
    arch: str = "resnet18"
    num_classes: int = 4
    num_patches: int = 16          # HR_NUM_CNT_SAMPLES + HR_NUM_PERIM_SAMPLES
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        """xs: (B, P, H, W, 3) normalized patches.

        Returns (per_patch_logits (B, P, C), ensemble_logits (B, C))."""
        b, p, h, w, c = xs.shape
        if p != self.num_patches:
            raise ValueError(f"expected {self.num_patches} patches, got {p}")

        x = xs.reshape(b * p, h, w, c)
        feats = ResNetEncoder(arch=self.arch, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              norm_dtype=self.norm_dtype,
                              axis_name=self.axis_name, name="trunk")(x, train=train)
        # GAP over the deepest stage → (B·P, F)
        f = jnp.mean(feats[0].astype(self.dtype), axis=(1, 2))

        per_patch = nn.Dense(self.num_classes, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc0")(f)
        per_patch = per_patch.reshape(b, p, self.num_classes).astype(jnp.float32)

        # ensemble MLP over concatenated patch features
        # (reference fc: Linear(n, n//2) → ReLU → Linear(n//2, 4),
        #  resnets_shift.py:133-139)
        feat_cat = f.reshape(b, p * f.shape[-1])
        n = feat_cat.shape[-1]
        y = nn.Dense(n // 2, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc_1")(feat_cat)
        y = nn.relu(y)
        y = nn.Dense(self.num_classes, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc_2")(y)
        return per_patch, y.astype(jnp.float32)
