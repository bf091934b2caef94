"""Round-3 (cont) exp_r5b: Linknet s2d cell-domain tail at bench scale.

Before: the Linknet fast path applied the flax decoder functionally
(native layout) — 4,539 p/s (exp_r5a), lane-starved by the mid=16-channel
convs at H/2 and H. After: blocks 3-4 + head run at H/4 cells in
s2d(2)/s2d(4) domains (fast_decoder.decode_linknet_cells), sharing the
Unet planar head contract.

Usage: nohup python scripts/exp_r5b.py > /tmp/exp_r5b.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

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

    print("platform:", jax.devices()[0].platform, flush=True)
    img = _synthetic_level2(4096, 3072)
    slide = VirtualPyramidSlide({2: img}, num_levels=3)

    for arch in ("resnet18", "resnet50"):
        cfg = default_config(compute_dtype="bfloat16",
                             arch_encoder=arch, model_name="Linknet")
        model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
        plan = plan_slide("bench", slide, cfg, mask_cache_dir=None)
        engine = DenseInferenceEngine(model, variables, cfg)
        assert engine.fast_linknet and engine._fcn_fast_ok()
        t0 = time.time()
        r = engine.device_throughput(plan, mode="fcn", iters=5)
        print(f"{arch:9s} Linknet s2d-tail {r['patches_per_sec']:8.1f} p/s "
              f"{r['sec_per_slide']*1e3:7.1f} ms/slide "
              f"(wall incl compile {time.time()-t0:.0f}s)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
