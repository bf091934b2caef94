"""Round-4a: attack decoder blocks 2-3 (22.3 ms of 54.3 — the largest
stage, exp_r3h re-run this session).

The s2d(2)-domain kernels carry the f²=4 structural-zero redundancy; the
route tensor shows each OUTPUT SUB-ROW only touches 2 of the 3 cell rows
(sy = a + dy - 1 ∈ {-1..1} for a=0, {0..2} for a=1), so every s2d(2) conv
(s2d_kernel AND upfold_kernel) can split into a top/bottom pair of
(2, 3)-window convs — HALF the MACs. Cost: each half emits 2·Cout channels
instead of 4·Cout (b2: 128 — healthy; b3: 64 — output-lane-starved), plus
one channel concat.

In-graph truncation A/B (exp_r3h methodology) at 3072×4096:
  base   stem+enc+b01 (T2)          ~23.9 ms
  D      + b2+b3 dense (T3, prod)   ~46.2 ms
  RS2    + b2 rowsplit, b3 dense
  RS23   + b2+b3 rowsplit
  RS2c1  + b2 rowsplit conv1 only (conv2 dense)
  NC     + dense but conv1 as split-sum (no concat materialization)
Plus pure conv-rate probes of the exact dense shapes (3-chained).

Usage: nohup python scripts/exp_r6a.py > /tmp/exp_r6a.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :1]
                         .astype(jnp.float32)))


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models import fast_decoder as fd
    from wsiseg_tpu.models.fast_decoder import (_s2d_route, s2d_kernel,
                                                upfold_kernel)
    from wsiseg_tpu.models.fast_encoder import encode_stages
    from wsiseg_tpu.models.infer_fast import pack_for_stem2
    from wsiseg_tpu.models.resnet import ENCODER_SPECS
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.ops.pallas_stem import fold_stem_weights2, stem_pool_conv

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    print("platform:", jax.devices()[0].platform, flush=True)

    H, W = 3072, 4096
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 255, (H, W, 3), np.uint8)
    packed = np.asarray(pack_for_stem2(img_u8, cfg.dataset_mean))
    if packed.shape[1] == 12:
        packed = np.pad(packed, ((0, 0), (0, 4), (0, 0)))
    packed = jnp.asarray(packed)
    sync(packed)

    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    dp = variables["params"]["decoder"]
    db = variables["batch_stats"]["decoder"]
    _, stages = ENCODER_SPECS[model.arch]
    bf = jnp.bfloat16

    # ---- row-split kernel transforms (host-side, exact) ----

    def s2d_kernel_split(w):
        """s2d_kernel as (top, bottom) (2, 3, 4Cin, 2Cout) kernels.
        conv(x, top, pad ((1,0),(1,1))) ++ conv(x, bottom, ((0,1),(1,1)))
        on channels == conv(x, s2d_kernel(w))."""
        route = np.asarray(_s2d_route(2))
        top = jnp.einsum("yxuvio,yxcm->uvicom",
                         jnp.asarray(route[:, :, 0:2, :, :, 0:2], w.dtype), w)
        bot = jnp.einsum("yxuvio,yxcm->uvicom",
                         jnp.asarray(route[:, :, 1:3, :, :, 2:4], w.dtype), w)
        cin, cout = w.shape[2], w.shape[3]
        return (top.reshape(2, 3, 4 * cin, 2 * cout),
                bot.reshape(2, 3, 4 * cin, 2 * cout))

    def upfold_kernel_split(w):
        route = np.asarray(_s2d_route(2).sum(axis=4))
        top = jnp.einsum("yxuvo,yxcm->uvcom",
                         jnp.asarray(route[:, :, 0:2, :, 0:2], w.dtype), w)
        bot = jnp.einsum("yxuvo,yxcm->uvcom",
                         jnp.asarray(route[:, :, 1:3, :, 2:4], w.dtype), w)
        cin, cout = w.shape[2], w.shape[3]
        return (top.reshape(2, 3, cin, 2 * cout),
                bot.reshape(2, 3, cin, 2 * cout))

    def conv_p(x, k, pad):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def conv_split(x, tk, bk):
        top = conv_p(x, tk, ((1, 0), (1, 1)))
        bot = conv_p(x, bk, ((0, 1), (1, 1)))
        return jnp.concatenate([top, bot], axis=-1)

    # sanity: row-split == dense on small shapes (f32, CPU-equivalent math)
    wt = jnp.asarray(rng.randn(3, 3, 8, 4), jnp.float32)
    xt = jnp.asarray(rng.randn(1, 6, 7, 32), jnp.float32)
    d = fd._conv(xt, s2d_kernel(wt))
    tk, bk = s2d_kernel_split(wt)
    s = conv_split(xt, tk, bk)
    err = float(jnp.abs(d - s).max())
    print("s2d rowsplit max err:", err, flush=True)
    assert err < 1e-4
    wu = jnp.asarray(rng.randn(3, 3, 16, 4), jnp.float32)
    xu = jnp.asarray(rng.randn(1, 6, 7, 16), jnp.float32)
    d = fd._conv(xu, upfold_kernel(wu))
    tk, bk = upfold_kernel_split(wu)
    s = conv_split(xu, tk, bk)
    err = float(jnp.abs(d - s).max())
    print("upfold rowsplit max err:", err, flush=True)
    assert err < 1e-4

    def stem(p):
        w336, bias2 = fold_stem_weights2(
            ep["stem_conv"]["kernel"], ep["stem_bn"]["scale"],
            ep["stem_bn"]["bias"], eb["stem_bn"]["mean"],
            eb["stem_bn"]["var"], cfg.dataset_mean, cfg.dataset_std)
        c1s2d, pool = stem_pool_conv(p, w336, bias2, H // 2, W // 2)
        half = H // 4
        return c1s2d[:half][None], pool[:half][None]

    def blocks01(feats):
        xx = feats[0].astype(bf)
        skips = list(feats[1:]) + [None]
        for i in (0, 1):
            blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
            xx = fd.upsample2x(xx)
            xx = jnp.concatenate([xx, skips[i].astype(bf)], axis=-1)
            for cj in (1, 2):
                y = fd._conv(xx, blk_p[f"conv{cj}"]["kernel"].astype(bf))
                s, t = fd._bn_affine(blk_p[f"bn{cj}"], blk_b[f"bn{cj}"])
                xx = jax.nn.relu(y * s + t).astype(bf)
        return xx, skips

    def b23(xx, skips, c1s2d, *, split1=(False, False),
            split2=(False, False), no_concat=False):
        """blocks 2-3 with per-block conv1/conv2 row-split switches."""
        for bi, i in enumerate((2, 3)):
            blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
            cup = xx.shape[-1]
            w1 = blk_p["conv1"]["kernel"]
            s1, t1 = fd._bn_affine(blk_p["bn1"], blk_b["bn1"])
            s2, t2 = fd._bn_affine(blk_p["bn2"], blk_b["bn2"])
            sk = c1s2d.astype(bf) if i == 3 \
                else fd.space_to_depth(skips[i].astype(bf))
            if split1[bi]:
                ut, ub = upfold_kernel_split(w1[:, :, :cup])
                st, sb = s2d_kernel_split(w1[:, :, cup:])
                top = conv_p(xx, ut.astype(bf), ((1, 0), (1, 1))) + \
                    conv_p(sk, st.astype(bf), ((1, 0), (1, 1)))
                bot = conv_p(xx, ub.astype(bf), ((0, 1), (1, 1))) + \
                    conv_p(sk, sb.astype(bf), ((0, 1), (1, 1)))
                y = jnp.concatenate([top, bot], axis=-1)
            elif no_concat:
                y = fd._conv(xx, upfold_kernel(w1[:, :, :cup]).astype(bf)) \
                    + fd._conv(sk, s2d_kernel(w1[:, :, cup:]).astype(bf))
            else:
                k1 = jnp.concatenate([upfold_kernel(w1[:, :, :cup]),
                                      s2d_kernel(w1[:, :, cup:])],
                                     axis=2).astype(bf)
                y = fd._conv(jnp.concatenate([xx, sk], axis=-1), k1)
            xs = jax.nn.relu(y * fd._tile4(s1) + fd._tile4(t1)).astype(bf)
            if split2[bi]:
                tk, bk = s2d_kernel_split(blk_p["conv2"]["kernel"])
                y = conv_split(xs, tk.astype(bf), bk.astype(bf))
            else:
                y = fd._conv(xs, s2d_kernel(blk_p["conv2"]["kernel"]
                                            ).astype(bf))
            xs = jax.nn.relu(y * fd._tile4(s2) + fd._tile4(t2)).astype(bf)
            xx = fd.depth_to_space(xs) if i == 2 else xs
        return xx

    def make(**kw):
        @jax.jit
        def t(p):
            c1s2d, pool = stem(p)
            feats = encode_stages(ep, eb, None, stages, bf, pooled=pool)
            xx, skips = blocks01(feats)
            return b23(xx, skips, c1s2d, **kw)
        return t

    base = make()
    out_base = base(packed)
    sync(out_base)

    variants = {
        "D (dense, production)": {},
        "NC (no-concat conv1)": dict(no_concat=True),
        "RS2c1 (b2 conv1 split)": dict(split1=(True, False)),
        "RS2 (b2 both split)": dict(split1=(True, False),
                                    split2=(True, False)),
        "RS23c1 (both conv1 split)": dict(split1=(True, True)),
        "RS23 (all four split)": dict(split1=(True, True),
                                      split2=(True, True)),
        "RS3 (b3 both split)": dict(split1=(False, True),
                                    split2=(False, True)),
    }
    for name, kw in variants.items():
        fn = make(**kw)
        out = fn(packed)
        err = float(jnp.abs(out.astype(jnp.float32)
                            - out_base.astype(jnp.float32)).max())
        bench(f"{name}  (max|d|={err:.4f})", fn, packed)

    # ---- pure conv-rate probes at the exact dense shapes (3-chained) ----
    def chain(k_shape, hw, flops_g):
        k1 = jnp.asarray(rng.randn(*k_shape) * 0.05, bf)
        cin = k_shape[2]
        cout = k_shape[3]
        kb = jnp.asarray(rng.randn(3, 3, cout, cin) * 0.05, bf)
        x = jnp.asarray(rng.randn(1, hw[0], hw[1], cin) * 0.5, bf)

        @jax.jit
        def f(x):
            y = fd._conv(x, k1).astype(bf)
            y = fd._conv(y, kb).astype(bf)
            y = fd._conv(y, k1).astype(bf)
            return y

        dt = bench(f"conv {k_shape} @ {hw}", f, x)
        fb = 2 * 9 * hw[0] * hw[1] * cin * cout * 2 / 1e9 + flops_g
        print(f"    -> {3 * flops_g / dt / 1e3:.1f} TFLOP/s "
              f"(fwd-kernel rate)", flush=True)

    for ks, hw in [((3, 3, 384, 256), (384, 512)),
                   ((3, 3, 320, 128), (768, 1024)),
                   ((3, 3, 128, 128), (768, 1024)),
                   ((3, 3, 256, 256), (384, 512))]:
        g = 9 * hw[0] * hw[1] * ks[2] * ks[3] * 2 / 1e9
        chain(ks, hw, g)


if __name__ == "__main__":
    main()
