"""Multi-chip dense inference: tile stream sharded over an 8-device mesh
matches the single-device result exactly."""

import jax
import numpy as np

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data.wsi_tiles import plan_slide
from wsiseg_tpu.infer.engine import DenseInferenceEngine
from wsiseg_tpu.models.ynet import init_ynet
from wsiseg_tpu.parallel.mesh import make_mesh
from wsiseg_tpu.slides.reader import SyntheticSlide


def test_sharded_matches_single_device():
    assert jax.device_count() == 8
    cfg = default_config(tile_w=64, tile_h=64, tile_stride_w=64,
                         tile_stride_h=64, compute_dtype="float32",
                         infer_batch_size=4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    engine = DenseInferenceEngine(model, variables, cfg)

    slide = SyntheticSlide(width=2048, height=1536, num_levels=3, seed=5)
    plan = plan_slide("s", slide, cfg, mask_cache_dir=None)
    assert plan is not None and len(plan.grid) > 0

    mesh = make_mesh(devices=jax.devices(), shape=(8,), axes=("data",))
    res_sharded = engine.predict_slide_sharded(plan, mesh)
    res_single = engine.predict_slide(plan)

    np.testing.assert_array_equal(res_sharded.labels, res_single.labels)
    np.testing.assert_allclose(res_sharded.heatmap, res_single.heatmap,
                               atol=1e-5)
