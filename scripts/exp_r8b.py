"""Round-8b: TPU numbers for the proposal/HR workload (round-4 VERDICT
next #7) — the one reference workload with no measured number.

1. SLIC superpixels (ops/slic.py jnp local-k-means) at the slic.py demo's
   production geometry: a level-2 thumb downsampled ×4 (cli/slic_demo.py
   US=4; reference slic.py:37), n_segments=200, 10 iters.
2. MultiPatchResNet region-ensemble inference (models/ensemble.py) at the
   HR serving shape (B, 16, 64, 64, 3) — the slic.py / scannet.py
   classification stage — swept over B, bf16, patches folded into batch.

Usage: nohup python scripts/exp_r8b.py > /tmp/exp_r8b.log 2>&1 &
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


def timed(fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]
                  .astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]
                  .astype(jnp.float32)))
    return (time.time() - t0) / iters


def main():
    from wsiseg_tpu.ops.slic import slic

    print("platform:", jax.devices()[0].platform, flush=True)

    # --- SLIC at demo geometry: level-2 3072x4096 → thumb /4 = 768x1024
    rng = np.random.RandomState(0)
    for (h, w) in ((768, 1024), (1024, 1536)):
        thumb = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        th = jnp.asarray(thumb)
        f = jax.jit(lambda x: slic(x, n_segments=200, compactness=20.0,
                                   sigma=5.0, iters=10))
        dt = timed(f, th, iters=4)
        print(f"slic {h}x{w} n=200 it=10: {dt*1e3:8.1f} ms "
              f"({h*w/dt/1e6:.1f} Mpx/s)", flush=True)

    # --- MultiPatchResNet (B, 16, 64, 64, 3) serving sweep
    from wsiseg_tpu.models.ensemble import MultiPatchResNet
    model = MultiPatchResNet(arch="resnet18", num_classes=4, num_patches=16)
    x0 = jnp.zeros((2, 16, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    for b in (8, 32, 64, 128):
        x = jnp.asarray(rng.randn(b, 16, 64, 64, 3).astype(np.float32))
        dt = timed(fwd, variables, x, iters=8)
        # regions/s and folded-patch p/s (B·16 64² patches per forward)
        print(f"ensemble B={b:4d}: {dt*1e3:7.2f} ms  "
              f"{b/dt:8.1f} regions/s  {b*16/dt:9.1f} patches/s", flush=True)


if __name__ == "__main__":
    main()
