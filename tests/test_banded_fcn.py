"""Banded (bounded-host-memory) chunked FCN (round-4 VERDICT weak #4).

The oversize-slide fallback used to stage the whole padded level on the
host (`_read_padded_level`) — a level-0-scale scan would OOM host RAM.
`predict_slide_fcn_banded` reads one chunk-row band at a time and must
equal the chunked single-device oracle exactly; `predict_slide_fcn`
auto-routes oversize slides to it without ever calling `read_level`.
"""

import jax
import numpy as np
import pytest

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data.wsi_tiles import plan_slide
from wsiseg_tpu.infer.engine import DenseInferenceEngine
from wsiseg_tpu.models.ynet import init_ynet
from wsiseg_tpu.slides.reader import SyntheticSlide


class _SpySlide:
    """SlideReader wrapper that records read sizes and forbids
    whole-level reads."""

    def __init__(self, inner):
        self._inner = inner
        self.max_read_px = 0
        self.read_level_calls = 0

    def __getattr__(self, name):
        return getattr(self._inner, name)

    @property
    def level_dimensions(self):
        return self._inner.level_dimensions

    @property
    def level_downsamples(self):
        return self._inner.level_downsamples

    @property
    def level_count(self):
        return self._inner.level_count

    def read_region(self, location, level, size):
        self.max_read_px = max(self.max_read_px, size[0] * size[1])
        return self._inner.read_region(location, level, size)

    def read_level(self, level):
        self.read_level_calls += 1
        return self._inner.read_level(level)


@pytest.fixture(scope="module")
def setup():
    cfg = default_config(tile_w=64, tile_h=64, tile_stride_w=64,
                         tile_stride_h=64, compute_dtype="float32",
                         infer_batch_size=4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    slide = SyntheticSlide(width=2048, height=1536, num_levels=3, seed=21)
    plan = plan_slide("band", slide, cfg, mask_cache_dir=None)
    assert plan is not None
    engine = DenseInferenceEngine(model, variables, cfg)
    return cfg, engine, plan


def test_banded_matches_chunked_oracle(setup):
    """Same executable, same 255-pad geometry → labels/heat/canvas equal
    the one-dispatch chunked path EXACTLY. chunk=32, halo=16 at level
    dims 128x96 → ny=3 bands, nx=4 chunks (64-px windows — Unet needs
    32-divisible chunk windows), with a short last band."""
    cfg, engine, plan = setup
    res_b = engine.predict_slide_fcn_banded(plan, chunk=32, halo=16,
                                            keep_canvas=True)
    res_c = engine.predict_slide_fcn(plan, chunk=32, halo=16,
                                     keep_canvas=True)
    np.testing.assert_array_equal(res_b.labels, res_c.labels)
    np.testing.assert_array_equal(
        np.round(res_b.heatmap * 255), np.round(res_c.heatmap * 255))
    np.testing.assert_allclose(res_b.canvas, res_c.canvas, atol=1e-5)


def test_banded_bounded_reads(setup):
    """The banded path never reads more than one halo-padded band, and
    never calls read_level."""
    cfg, engine, plan = setup
    spy = _SpySlide(plan.slide)
    import dataclasses
    spy_plan = dataclasses.replace(plan, slide=spy)
    engine.predict_slide_fcn_banded(spy_plan, chunk=32, halo=16)
    hs, ws = plan.stitch_hw
    assert spy.read_level_calls == 0
    band_px = (32 + 2 * 16) * ws
    assert 0 < spy.max_read_px <= band_px, \
        f"read {spy.max_read_px} px > one band {band_px}"
    assert spy.max_read_px < hs * ws  # never the whole level


def test_oversize_autoroutes_to_banded(setup):
    """predict_slide_fcn on a slide past fcn_fast_max_px routes to the
    banded path (no whole-level host read) and matches the fast path's
    chunk-free labels within chunk-seam tolerance — here we compare to
    the explicit banded call, which must be identical."""
    cfg, engine, plan = setup
    spy = _SpySlide(plan.slide)
    import dataclasses
    spy_plan = dataclasses.replace(plan, slide=spy)
    old_cap = getattr(engine, "fcn_fast_max_px", None)
    engine.fcn_fast_max_px = 1000           # force the oversize route
    try:
        res = engine.predict_slide_fcn(spy_plan)
        assert spy.read_level_calls == 0
        ref = engine.predict_slide_fcn_banded(plan)
        np.testing.assert_array_equal(res.labels, ref.labels)
    finally:
        if old_cap is None:
            del engine.fcn_fast_max_px
        else:
            engine.fcn_fast_max_px = old_cap


def test_evaluator_oversize_uses_banded(setup, tmp_path):
    """The pipelined evaluator no longer stages whole padded levels for
    oversize slides (stage_group returns None → banded route)."""
    from wsiseg_tpu.data.wsi_tiles import SlideCollection
    from wsiseg_tpu.infer.evaluators import predict_tumorbed

    cfg, engine, plan = setup
    cfg2 = cfg.replace(val_save_pth=str(tmp_path))
    eng = DenseInferenceEngine(engine.model, engine.variables, cfg2)
    eng.fcn_fast_max_px = 1000
    spy = _SpySlide(plan.slide)
    coll = SlideCollection([("s", spy)], cfg2, mask_cache_dir=None)
    res = predict_tumorbed(eng, coll, ep=0, fcn=True, log=lambda s: None)
    assert "s" in res
    # read_level(2) is used for the overlay artifact only — the INFERENCE
    # path reads bands; assert no read bigger than the default 4096-band
    hs, ws = plan.stitch_hw
    assert spy.max_read_px <= (4096 + 2 * 128) * ws
