"""Round-3g: where does the fcn e2e second go?

Breaks predict_slide_fcn into stages and times each through the relay:
  read+pad (host) / upload (device_put) / mask2 prep / fused dispatch
  (forward+post, device) / D2H labels4 (2-bit packed) / D2H heat4 /
  host interleave.  Then the composed predict_slide_fcn and the
  pipelined variant for comparison.

Usage: nohup python scripts/exp_r3g.py > /tmp/exp_r3g.log 2>&1 &
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
    from bench import _synthetic_level2
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.data.wsi_tiles import plan_slide
    from wsiseg_tpu.infer.engine import DenseInferenceEngine
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.slides.reader import VirtualPyramidSlide

    platform = jax.devices()[0].platform
    print("platform:", platform, flush=True)
    on_tpu = platform != "cpu"
    cfg = default_config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        norm_dtype="bfloat16" if on_tpu else "float32",
        batch_size=128)
    img = _synthetic_level2(4096, 3072)
    slide = VirtualPyramidSlide({2: img}, num_levels=3)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    engine = DenseInferenceEngine(model, variables, cfg)
    plan = plan_slide("bench", slide, cfg, mask_cache_dir=None)

    # ---- warm everything once
    r = engine.predict_slide_fcn(plan, halo=128)
    print("warm ok, num_tiles", r.num_tiles, flush=True)

    def t(name, fn, iters=3):
        ts = []
        for _ in range(iters):
            t0 = time.time()
            out = fn()
            ts.append(time.time() - t0)
        print(f"{name:44s} {min(ts)*1e3:9.1f} ms  (min of {iters}: "
              f"{', '.join(f'{x*1e3:.0f}' for x in ts)})", flush=True)
        return out

    hs, ws = plan.stitch_hw
    hp, wp = engine._fcn_fast_dims(hs, ws)

    img_pad = t("read+pad (host)", lambda: engine._read_padded_level(plan))

    def up():
        d = jax.device_put(img_pad)
        d.block_until_ready()
        return d
    dimg = t("upload device_put (37.7 MB)", up)

    from wsiseg_tpu.models.fast_decoder import S2D_HEAD_F
    f = S2D_HEAD_F
    mask2 = t("mask2 prep (host+upload)",
              lambda: engine._half_mask(plan, (hp // f, wp // f)))

    runner = engine._fused_planar_run(raw=True, fold=False, interp=False,
                                      hp=hp, wp=wp)

    def disp():
        out = runner(engine.variables, dimg, mask2)
        return jax.block_until_ready(out)
    labels4, heat4 = t("fused dispatch (device)", disp)

    l_np = t(f"D2H labels4 {labels4.nbytes/1e6:.1f} MB",
             lambda: np.asarray(labels4))
    h_np = t(f"D2H heat4 {heat4.nbytes/1e6:.1f} MB",
             lambda: np.asarray(heat4))

    lab_full = t("host unpack+interleave labels",
                 lambda: engine._interleave4(
                     engine._unpack_labels(l_np, f * f), hs, ws))
    t("host interleave heat",
      lambda: engine._interleave4(h_np, hs, ws).astype(np.float32) / 255.0)

    t("predict_slide_fcn composed", lambda: engine.predict_slide_fcn(
        plan, halo=128), iters=3)

    staged = engine.stage_slide_fcn(plan)
    t("predict w/ pre-staged img", lambda: engine.predict_slide_fcn(
        plan, img=staged), iters=3)

    print("done", flush=True)


if __name__ == "__main__":
    main()
