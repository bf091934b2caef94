"""Fresh per-group timings of decode_fast on the final round-2 state
(informs round 3). Usage: nohup python scripts/exp_dec_stages.py > /tmp/exp_dec_stages.log 2>&1 &
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from wsiseg_tpu.config import default_config
from wsiseg_tpu.models.fast_decoder import (_bn_affine, _conv, _tile4,
                                            s2d_kernel, upfold_kernel,
                                            upsample2x)
from wsiseg_tpu.models.fast_encoder import encode_stages
from wsiseg_tpu.models.resnet import ENCODER_SPECS
from wsiseg_tpu.models.ynet import init_ynet

def bench(name, fn, *args, iters=8):
    out = fn(*args); float(jnp.sum(out.reshape(-1)[:16].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters): out = fn(*args)
    float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
    print(f"{name:40s} {(time.time()-t0)/iters*1e3:8.2f} ms", flush=True)

def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    H, W = 3072, 4096
    cfg = default_config(compute_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    ep = variables["params"]["encoder"]; eb = variables["batch_stats"]["encoder"]
    _, stages = ENCODER_SPECS[model.arch]
    rng = np.random.RandomState(0)
    c1 = jnp.asarray(rng.randn(1, H//2, W//2, 64).astype(np.float32)).astype(jnp.bfloat16)
    feats = jax.jit(lambda c: encode_stages(ep, eb, c, stages, jnp.bfloat16))(c1)
    dp = variables["params"]["decoder"]; db = variables["batch_stats"]["decoder"]

    def blocks01(feats):
        xx = feats[0].astype(jnp.bfloat16)
        skips = list(feats[1:]) + [None]
        for i in (0, 1):
            bp, bb = dp[f"block{i}"], db[f"block{i}"]
            xx = upsample2x(xx)
            xx = jnp.concatenate([xx, skips[i].astype(xx.dtype)], -1)
            for cj in (1, 2):
                y = _conv(xx, bp[f"conv{cj}"]["kernel"].astype(xx.dtype))
                s, t = _bn_affine(bp[f"bn{cj}"], bb[f"bn{cj}"])
                xx = jax.nn.relu(y * s + t).astype(xx.dtype)
        return xx
    bench("blocks 0-1", jax.jit(blocks01), feats)
    x1 = jax.jit(blocks01)(feats)

    def blocks23(x1, feats):
        xx = x1
        skips = list(feats[1:]) + [None]
        for i in (2, 3):
            bp, bb = dp[f"block{i}"], db[f"block{i}"]
            xx = upsample2x(xx)
            xx = jnp.concatenate([xx, skips[i].astype(xx.dtype)], -1)
            for cj in (1, 2):
                y = _conv(xx, bp[f"conv{cj}"]["kernel"].astype(xx.dtype))
                s, t = _bn_affine(bp[f"bn{cj}"], bb[f"bn{cj}"])
                xx = jax.nn.relu(y * s + t).astype(xx.dtype)
        return xx
    bench("blocks 2-3", jax.jit(blocks23), x1, feats)
    x3 = jax.jit(blocks23)(x1, feats)

    def tail(xx):
        bp, bb = dp["block4"], db["block4"]
        k1 = upfold_kernel(bp["conv1"]["kernel"]).astype(xx.dtype)
        y = _conv(xx, k1)
        s1, t1 = _bn_affine(bp["bn1"], bb["bn1"])
        xs = jax.nn.relu(y * _tile4(s1) + _tile4(t1)).astype(xx.dtype)
        k2 = s2d_kernel(bp["conv2"]["kernel"]).astype(xx.dtype)
        y = _conv(xs, k2)
        s2, t2 = _bn_affine(bp["bn2"], bb["bn2"])
        xs = jax.nn.relu(y * _tile4(s2) + _tile4(t2)).astype(xx.dtype)
        head = dp["seg_head"]
        kh = s2d_kernel(head["kernel"]).astype(xx.dtype)
        return _conv(xs, kh) + _tile4(head["bias"].astype(jnp.float32))
    bench("tail (upfold b4 + head, s2d out)", jax.jit(tail), x3)
    print("done", flush=True)

if __name__ == "__main__":
    main()
