"""Round-3k: hybrid train-step time with vs without state donation.

README's 161 ms/step (512², batch 16, bf16) was measured without
donate_argnums; donation lets XLA reuse the old param/opt buffers
in-place (the trainer CLIs now pass donate_argnums=0).

Usage: nohup python scripts/exp_r3k.py > /tmp/exp_r3k.log 2>&1 &
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


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.train.steps import make_hybrid_train_step
    from wsiseg_tpu.cli.common import setup_ynet

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16",
                         batch_size=16)
    model, tx, state, _ = setup_ynet(cfg)

    rng = np.random.RandomState(0)
    bs = cfg.batch_size
    batch = {
        "image": jnp.asarray(rng.rand(bs, 512, 512, 3), jnp.float32),
        "cls_label": jnp.asarray(rng.randint(0, 4, bs), jnp.int32),
        "reg_label": jnp.asarray(rng.rand(bs), jnp.float32),
        "seg_label": jnp.asarray(rng.randint(0, 4, (bs, 512, 512)),
                                 jnp.int32),
        "is_cls": jnp.ones(bs, jnp.float32),
        "is_reg": jnp.ones(bs, jnp.float32),
        "is_seg": jnp.ones(bs, jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    def timeit(name, step, st):
        st, m = step(st, batch, key)           # compile
        float(jnp.sum(jax.tree_util.tree_leaves(m)[0]))
        t0 = time.time()
        for _ in range(10):
            st, m = step(st, batch, key)
        float(jnp.sum(jax.tree_util.tree_leaves(m)[0]))
        dt = (time.time() - t0) / 10
        print(f"{name:28s} {dt * 1e3:8.1f} ms/step", flush=True)
        return st

    base = make_hybrid_train_step(model, tx, cfg)
    import copy
    timeit("no donation", jax.jit(base), state)
    model2, tx2, state2, _ = setup_ynet(cfg)
    timeit("donate_argnums=0", jax.jit(base, donate_argnums=0), state2)
    print("done", flush=True)


if __name__ == "__main__":
    main()
