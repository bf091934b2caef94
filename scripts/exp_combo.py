"""Measure the FULL fold-path combos (encoder XLA/fold x decoder
chain/singles x planar head) in-graph at bench scale.

Usage: nohup python scripts/exp_combo.py > /tmp/exp_combo.log 2>&1 &
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from wsiseg_tpu.config import default_config
from wsiseg_tpu.models.infer_fast import pack_for_stem, _segment_packed
from wsiseg_tpu.models.ynet import init_ynet

def bench(name, fn, *args, iters=5):
    t0 = time.time()
    try:
        out = fn(*args)
        float(jnp.sum(out.reshape(-1)[:64].astype(jnp.float32)))
    except Exception as e:
        print(f"{name:48s} FAILED {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return None
    c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.reshape(-1)[:16].astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    print(f"{name:48s} {dt*1e3:8.2f} ms (compile {c:.0f}s)", flush=True)
    return dt

def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    H, W = 3072, 4096
    cfg = default_config(compute_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    packed = jnp.asarray(pack_for_stem(img, cfg.dataset_mean))
    mean, std = tuple(cfg.dataset_mean), tuple(cfg.dataset_std)

    def run(name, **kw):
        bench(name, lambda p: _segment_packed(
            variables, p, mean, std, arch=model.arch, h=H, w=W, fold=True,
            planar_head=True, **kw), packed)

    run("encXLA + dec-chain planar", use_chain=True)
    run("encXLA + dec-singles planar", use_chain=False)
    run("encFOLD + dec-chain planar", use_chain=True, fold_encoder=True)
    print("done", flush=True)

if __name__ == "__main__":
    main()
