"""Round-3 (cont) exp_r5a: fast-path breadth measurements at bench scale.

Device throughput (HBM-resident, fused whole-image dispatch) for every
(encoder, decoder) family now covered by the fast FCN path:

  resnet18 x {Unet, FPN, PSPNet, Linknet}
  resnet50 x {Unet, FPN}

vs the chunked flax fallback for the same model (what these families ran
before this change).

Usage: nohup python scripts/exp_r5a.py > /tmp/exp_r5a.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np


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

    combos = [("resnet18", "Unet"), ("resnet18", "FPN"),
              ("resnet18", "PSPNet"), ("resnet18", "Linknet"),
              ("resnet50", "Unet"), ("resnet50", "FPN")]
    for arch, dec in combos:
        cfg = default_config(compute_dtype="bfloat16",
                             arch_encoder=arch, model_name=dec)
        model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
        plan = plan_slide("bench", slide, cfg, mask_cache_dir=None)
        engine = DenseInferenceEngine(model, variables, cfg)
        t0 = time.time()
        r = engine.device_throughput(plan, mode="fcn", iters=5)
        print(f"{arch:9s} {dec:8s} fast  {r['patches_per_sec']:8.1f} p/s  "
              f"{r['sec_per_slide']*1e3:7.1f} ms/slide  "
              f"(wall incl compile {time.time()-t0:.0f}s)", flush=True)
        # chunked flax fallback (the pre-change execution for non-Unet)
        if dec != "Unet":
            engine2 = DenseInferenceEngine(model, variables, cfg,
                                           fast_seg=False)
            t0 = time.time()
            r2 = engine2.device_throughput(plan, mode="fcn", iters=3,
                                           chunk=4096)
            print(f"{arch:9s} {dec:8s} chunk {r2['patches_per_sec']:8.1f} "
                  f"p/s  {r2['sec_per_slide']*1e3:7.1f} ms/slide  "
                  f"(wall incl compile {time.time()-t0:.0f}s)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
