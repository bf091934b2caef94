"""Train-mode s2d tail: conv1 over concat(x, skip) vs TWO summed convs.

Mirrors the round-4 inference win (decode_cells conv1 as summed up/skip
convs, exp_r6a): at b128 @512² the block3 concat materializes
(128,128,128,320)·bf16 ≈ 1.3 GB forward plus its slice in backward.
exp_r7b: decoder grad = 181 ms of the 278 ms step — this probes whether
the summed form pays in TRAIN mode (exp_r6a measured the native-layout
blocks 0-1 concat as the OPPOSITE at slide scale — cell domain only).

A/B: full hybrid-step timing with the stock _S2dTailBlock vs a variant
whose conv1 runs as conv(x, upfold(k_up)) + conv(skip, s2d(k_skip)).

Usage: nohup python scripts/exp_r7c.py > /tmp/exp_r7c.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from bench_train import make_batch  # noqa: E402

from wsiseg_tpu.models import unet  # noqa: E402
from wsiseg_tpu.models.unet import (_S2dConv, _S2dGroupBatchNorm)  # noqa


class _SumConv1(nn.Module):
    """conv1 twin: same param path/shape (kernel (3,3,in,F)), applied as
    conv(x, upfold(k_up)) + conv(skip, s2d(k_skip)) — no concat."""
    features: int
    in_features: int
    split: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        from wsiseg_tpu.models.fast_decoder import s2d_kernel, upfold_kernel
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features),
                            self.param_dtype)
        ku = upfold_kernel(kernel[:, :, :self.split]).astype(self.dtype)
        ks = s2d_kernel(kernel[:, :, self.split:]).astype(self.dtype)
        pad = [(1, 1), (1, 1)]
        dn = ("NHWC", "HWIO", "NHWC")
        return (jax.lax.conv_general_dilated(
                    x.astype(self.dtype), ku, (1, 1), pad,
                    dimension_numbers=dn)
                + jax.lax.conv_general_dilated(
                    skip.astype(self.dtype), ks, (1, 1), pad,
                    dimension_numbers=dn))


class _SumTailBlock(nn.Module):
    """_S2dTailBlock variant: s2d2 conv1 as two summed convs (no concat).
    Identical param tree (conv1/kernel is the same (3,3,in,F) param)."""
    filters: int
    in_features: int
    kind: str
    split: int = 0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, skip_s2d=None):
        from wsiseg_tpu.models.fast_decoder import s2d_kernel, upfold_kernel
        f2 = 4 if self.kind == "s2d2" else 16
        if self.kind == "s2d2" and skip_s2d is not None:
            y = _SumConv1(self.filters, self.in_features, self.split,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="conv1")(x, skip_s2d)
        else:
            if skip_s2d is not None:
                x = jnp.concatenate([x, skip_s2d.astype(x.dtype)], axis=-1)
            y = _S2dConv(self.filters, self.in_features,
                         "upfold2" if self.kind != "s2d2" else "upfold_cat",
                         split=self.split, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv1")(x)
        y = _S2dGroupBatchNorm(self.filters, f2, momentum=self.bn_momentum,
                               dtype=self.norm_dtype,
                               param_dtype=self.param_dtype,
                               axis_name=self.axis_name, name="bn1")(y)
        y = nn.relu(y).astype(self.dtype)
        t2 = "s2d2" if self.kind == "s2d2" else "s2d4"
        y = _S2dConv(self.filters, self.filters, t2, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="conv2")(y)
        y = _S2dGroupBatchNorm(self.filters, f2, momentum=self.bn_momentum,
                               dtype=self.norm_dtype,
                               param_dtype=self.param_dtype,
                               axis_name=self.axis_name, name="bn2")(y)
        return nn.relu(y).astype(self.dtype)


def time_step(label: str, bs: int = 128, tile: int = 512):
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.optim import build_optimizer
    from wsiseg_tpu.train import steps
    from wsiseg_tpu.train.state import TrainState

    cfg = default_config(tile_w=tile, tile_h=tile, lr=1e-4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg)
    state = TrainState.create(variables, tx)
    hybrid = jax.jit(steps.make_hybrid_train_step(model, tx, cfg))
    batch = make_batch(bs, tile)
    rng = jax.random.PRNGKey(1)

    s, m = hybrid(state, batch, rng)
    s, m = hybrid(s, batch, rng)
    float(m["loss"])
    t0 = time.time()
    for _ in range(10):
        s, m = hybrid(s, batch, rng)
    float(m["loss"])
    dt = (time.time() - t0) / 10
    print(f"  {label:12s}: {dt * 1e3:7.1f} ms  ({bs / dt:.1f} p/s)",
          flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    print("== b128 full hybrid step, concat vs summed conv1 ==", flush=True)
    time_step("stock")
    orig = unet._S2dTailBlock
    unet._S2dTailBlock = _SumTailBlock
    try:
        time_step("summed")
    finally:
        unet._S2dTailBlock = orig
    print("done", flush=True)


if __name__ == "__main__":
    main()
