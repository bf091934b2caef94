"""Grid-mode batch-size sweep on the bench slide (device_throughput).

Usage: nohup python scripts/exp_grid_batch.py > /tmp/exp_grid_batch.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import _synthetic_level2
from wsiseg_tpu.config import default_config
from wsiseg_tpu.data.wsi_tiles import plan_slide
from wsiseg_tpu.infer.engine import DenseInferenceEngine
from wsiseg_tpu.models.ynet import init_ynet
from wsiseg_tpu.slides.reader import VirtualPyramidSlide


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    level2 = _synthetic_level2(4096, 3072)
    slide = VirtualPyramidSlide({2: level2}, num_levels=3)

    for bs in (96, 160, 192):
        cfg = default_config(compute_dtype="bfloat16",
                             norm_dtype="bfloat16", infer_batch_size=bs)
        model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
        engine = DenseInferenceEngine(model, variables, cfg)
        plan = plan_slide("bench", slide, cfg, mask_cache_dir=None)
        try:
            r = engine.device_throughput(plan, mode="grid", iters=3)
            print(f"grid bs={bs}: {r['patches_per_sec']:.1f} p/s "
                  f"({r['sec_per_slide']:.3f} s/slide)", flush=True)
        except Exception as e:
            print(f"grid bs={bs}: FAILED {e!r}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
