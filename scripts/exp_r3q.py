"""Round-3q: slides-in-flight past 12 (16-24; opportunistic, contended host).

exp_r3h measured 1/2/3/4/6 = 10777/11266/11470/11558/11724 p/s —
monotonic but flattening. The single→x6 delta implies ~8-10 ms of fixed
per-dispatch cost (relay RPC + queue drain), so deeper batching may
still pay. HBM check: each staged slide is ~270 MB packed, 12 in flight
≈ 3.2 GB — comfortable in 16 GB.

Usage: nohup python scripts/exp_r3q.py > /tmp/exp_r3q.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    from bench import _synthetic_level2
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.data.wsi_tiles import plan_slide
    from wsiseg_tpu.infer.engine import DenseInferenceEngine
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.slides.reader import VirtualPyramidSlide

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16",
                         infer_batch_size=128)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    engine = DenseInferenceEngine(model, variables, cfg)
    img = _synthetic_level2(4096, 3072)
    slide = VirtualPyramidSlide({2: img}, num_levels=3)
    plan = plan_slide("bench", slide, cfg, mask_cache_dir=None)
    print("platform:", jax.devices()[0].platform, flush=True)

    for nsf in (12, 16, 20, 24):
        r = engine.device_throughput(plan, mode="fcn", iters=5,
                                     slides_in_flight=nsf)
        print(f"slides_in_flight={nsf}: {r['patches_per_sec']:8.1f} p/s  "
              f"{r['sec_per_slide'] * 1e3:6.1f} ms/slide", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
