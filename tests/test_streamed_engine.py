"""Streamed dense inference (host tile decode + prefetch) matches the
HBM-resident gather path bit-for-bit on the same grid."""

import numpy as np
import jax

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data.wsi_tiles import plan_slide
from wsiseg_tpu.infer.engine import DenseInferenceEngine
from wsiseg_tpu.models.ynet import init_ynet
from wsiseg_tpu.slides.reader import SyntheticSlide


def test_streamed_matches_resident():
    cfg = default_config(tile_w=64, tile_h=64, tile_stride_w=64,
                         tile_stride_h=64, compute_dtype="float32",
                         infer_batch_size=8)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    engine = DenseInferenceEngine(model, variables, cfg)

    slide = SyntheticSlide(width=2048, height=1536, num_levels=3, seed=2)
    plan = plan_slide("s", slide, cfg, mask_cache_dir=None)
    assert plan is not None and len(plan.grid) > 0

    res_resident = engine.predict_slide(plan)
    res_streamed = engine.predict_slide_streamed(plan, nthreads=2)

    np.testing.assert_array_equal(res_streamed.labels, res_resident.labels)
    np.testing.assert_allclose(res_streamed.heatmap, res_resident.heatmap,
                               atol=1e-5)


def test_streamed_native_read_tiles(tmp_path):
    """Streamed mode exercises NativeSlide.read_tiles (C++ threaded path)."""
    from wsiseg_tpu.slides.native import NativeSlide, write_raw_pyramid

    cfg = default_config(tile_w=64, tile_h=64, tile_stride_w=64,
                         tile_stride_h=64, compute_dtype="float32",
                         infer_batch_size=8)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    engine = DenseInferenceEngine(model, variables, cfg)

    syn = SyntheticSlide(width=2048, height=1536, num_levels=3, seed=2)
    levels = [syn.read_level(k) for k in range(3)]
    pth = str(tmp_path / "s.wsiraw")
    write_raw_pyramid(pth, levels)
    nslide = NativeSlide(pth)

    plan_syn = plan_slide("a", syn, cfg, mask_cache_dir=None)
    plan_nat = plan_slide("b", nslide, cfg, mask_cache_dir=None)
    assert len(plan_nat.grid) == len(plan_syn.grid)

    res_nat = engine.predict_slide_streamed(plan_nat, nthreads=4)
    res_syn = engine.predict_slide(plan_syn)
    np.testing.assert_array_equal(res_nat.labels, res_syn.labels)
