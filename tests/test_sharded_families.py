"""Decoder-family breadth x sharded fast paths (round-4 VERDICT weak #3).

All sharded-inference tests previously ran the default Unet only; the
fast-path family work (FPN/PSPNet native flax decoders, Linknet s2d cell
tail) never composed with stripe halos or slide-parallel shard_map. These
tests pin the s2d/native plane contracts under sharding for every
reference decoder family (myargs.py:9-10 selector).
"""

import jax
import numpy as np
import pytest

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data.wsi_tiles import plan_slide
from wsiseg_tpu.infer.engine import DenseInferenceEngine
from wsiseg_tpu.models.ynet import init_ynet
from wsiseg_tpu.parallel.mesh import make_mesh
from wsiseg_tpu.slides.reader import SyntheticSlide

FAMILIES = ("FPN", "PSPNet", "Linknet")


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8
    return make_mesh(devices=jax.devices(), shape=(8,), axes=("data",))


@pytest.fixture(scope="module", params=FAMILIES)
def family_setup(request):
    name = request.param
    cfg = default_config(tile_w=64, tile_h=64, tile_stride_w=64,
                         tile_stride_h=64, compute_dtype="float32",
                         infer_batch_size=4, model_name=name)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(3),
                                 tile_hw=(64, 64))
    slide = SyntheticSlide(width=2048, height=1536, num_levels=3, seed=11)
    plan = plan_slide("fam", slide, cfg, mask_cache_dir=None)
    assert plan is not None and len(plan.grid) > 0
    return name, cfg, model, variables, plan


def test_fcn_sharded_rows_families(family_setup, mesh):
    """Row-striped FCN == the chunked single-device oracle with the SAME
    stripe geometry, for every non-Unet family. Both run the flax forward,
    so labels/canvas must match exactly — a family whose halo/receptive-
    field contract breaks under striping fails here."""
    name, cfg, model, variables, plan = family_setup
    engine = DenseInferenceEngine(model, variables, cfg)
    res_rows = engine.predict_slide_fcn_sharded_rows(
        plan, mesh, halo=16, keep_canvas=True)
    lw, lh = plan.slide.level_dimensions[cfg.scan_level]
    ch, cw = engine.fcn_stripe_geometry(lh, lw, mesh.shape["data"])
    res_chunk = engine.predict_slide_fcn(plan, chunk=(ch, cw), halo=16,
                                         keep_canvas=True)
    np.testing.assert_allclose(res_rows.canvas, res_chunk.canvas,
                               atol=1e-5, err_msg=name)
    np.testing.assert_array_equal(res_rows.labels, res_chunk.labels,
                                  err_msg=name)
    np.testing.assert_allclose(res_rows.heatmap, res_chunk.heatmap,
                               atol=1e-5, err_msg=name)


def test_slide_parallel_fcn_families(family_setup, mesh):
    """Slide-parallel serving (one slide per device through the fused
    dispatch under shard_map) == the single-device fused fast path, for
    every non-Unet family. Exercises _postprocess_native_planes (FPN/
    PSPNet) and the Linknet s2d cell tail inside shard_map."""
    name, cfg, model, variables, plan = family_setup
    slides = [SyntheticSlide(width=2048, height=1536, num_levels=3, seed=s)
              for s in range(50, 58)]
    plans = [plan_slide(f"{name}{k}", s, cfg, mask_cache_dir=None)
             for k, s in enumerate(slides)]
    assert all(p is not None for p in plans)

    engine = DenseInferenceEngine(model, variables, cfg)
    engine.fcn_fast_interpret = True
    assert engine._fcn_fast_ok(), name
    sharded = engine.predict_slides_fcn_sharded(plans, mesh)
    assert len(sharded) == 8
    for p, res in zip(plans[:2], sharded[:2]):  # 2 singles bound CPU time
        single = engine.predict_slide_fcn(p)
        np.testing.assert_array_equal(res.labels, single.labels,
                                      err_msg=name)
        np.testing.assert_allclose(res.heatmap, single.heatmap, atol=1e-6,
                                   err_msg=name)
