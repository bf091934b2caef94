"""Y-Net: shared ResNet encoder + U-Net decoder + classifier/regressor heads.

The reference builds this by monkey-patching heads onto an smp model
(train.py:35, train_cellularity.py:28-29, models/models.py); here it is one
flax module with explicit sub-modules and method entry points so eval paths
can run encoder+head only (reference utils/eval.py:196-200 dispatches
encoder→classifier or encoder→decoder).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from wsiseg_tpu.config import Config
from wsiseg_tpu.models.heads import Classifier, Regressor
from wsiseg_tpu.models.resnet import ResNetEncoder
from wsiseg_tpu.models.unet import UNetDecoder


class YNet(nn.Module):
    arch: str = "resnet18"
    num_classes: int = 4
    num_reg_outputs: int = 1
    decoder: str = "Unet"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    axis_name: str | None = None
    # train-mode s2d cell-domain decoder tail (exact; Unet and Linknet) —
    # see unet.UNetDecoder.s2d_tail / decoders.LinknetDecoder.s2d_tail
    s2d_train_tail: bool = False
    # with the tail: emit seg logits in s2d(4) layout at train time and tag
    # the output dict with "seg_s2d": 4 so steps pair them with
    # losses.cross_entropy_s2d (unet.UNetDecoder.s2d_logits)
    s2d_train_logits: bool = False

    def setup(self):
        self.encoder_m = ResNetEncoder(
            arch=self.arch, dtype=self.dtype, param_dtype=self.param_dtype,
            norm_dtype=self.norm_dtype,
            axis_name=self.axis_name, name="encoder")
        decoder_cls = {
            "Unet": UNetDecoder,
        }
        if self.decoder != "Unet":
            from wsiseg_tpu.models.decoders import (FPNDecoder,
                                                    LinknetDecoder,
                                                    PSPDecoder)
            decoder_cls.update({"FPN": FPNDecoder, "PSPNet": PSPDecoder,
                                "Linknet": LinknetDecoder})
        if self.decoder not in decoder_cls:
            raise ValueError(f"unknown decoder {self.decoder!r}")
        extra = ({"s2d_tail": True}
                 if self.s2d_train_tail
                 and self.decoder in ("Unet", "Linknet") else {})
        if extra and self.s2d_train_logits:
            extra["s2d_logits"] = True
        self.decoder_m = decoder_cls[self.decoder](
            num_classes=self.num_classes, dtype=self.dtype,
            param_dtype=self.param_dtype, norm_dtype=self.norm_dtype,
            axis_name=self.axis_name,
            name="decoder", **extra)
        self.classifier_m = Classifier(
            self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype,
            name="classifier")
        self.regressor_m = Regressor(
            self.num_reg_outputs, dtype=self.dtype,
            param_dtype=self.param_dtype, name="regressor")

    def __call__(self, x, train: bool = False):
        """Full three-head forward. x: (B, H, W, 3) float32 normalized.

        Returns dict(seg=(B,H,W,C) logits, cls=(B,C) logits, reg=(B,R))."""
        feats = self.encoder_m(x, train=train)
        seg = self.decoder_m(feats, train=train)
        out = {
            "seg": seg,
            "cls": self.classifier_m(feats[0]),
            "reg": self.regressor_m(feats[0]),
        }
        if (hasattr(self.decoder_m, "emits_s2d_logits")
                and self.decoder_m.emits_s2d_logits(feats, train)):
            out["seg_s2d"] = 4
        return out

    def encode(self, x, train: bool = False):
        return self.encoder_m(x, train=train)

    def segment(self, x, train: bool = False):
        """encoder → decoder only (reference eval 'seg' mode)."""
        return self.decoder_m(self.encoder_m(x, train=train), train=train)

    def classify(self, x, train: bool = False):
        """encoder → classifier only (reference eval 'cls' mode)."""
        return self.classifier_m(self.encoder_m(x, train=train)[0])

    def regress(self, x, train: bool = False):
        return self.regressor_m(self.encoder_m(x, train=train)[0])


def build_ynet(cfg: Config, axis_name: str | None = None) -> YNet:
    return YNet(arch=cfg.arch_encoder, num_classes=cfg.num_classes,
                decoder=cfg.model_name,
                dtype=jnp.dtype(cfg.compute_dtype),
                param_dtype=jnp.dtype(cfg.param_dtype),
                norm_dtype=jnp.dtype(getattr(cfg, 'norm_dtype', 'float32')),
                axis_name=axis_name,
                s2d_train_tail=getattr(cfg, 'train_s2d_tail', False),
                s2d_train_logits=getattr(cfg, 'train_s2d_loss', False))


def init_ynet(cfg: Config, rng: jax.Array, tile_hw: tuple[int, int] | None = None,
              axis_name: str | None = None):
    """Initialize params/batch_stats with a dummy batch."""
    model = build_ynet(cfg, axis_name=axis_name)
    h, w = tile_hw if tile_hw is not None else (cfg.tile_h, cfg.tile_w)
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    # jit the init: eager flax init dispatches hundreds of ops one by one
    # (~80s on CPU for the 512² Y-Net); compiled it is a few seconds.
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, dummy, train=False)
    return model, variables
