"""Dense WSI inference engine end-to-end on a synthetic slide."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data.wsi_tiles import SlideCollection, plan_slide
from wsiseg_tpu.infer.engine import DenseInferenceEngine, extract_tumor_bed
from wsiseg_tpu.infer.evaluators import predict_tumorbed, predict_wsis
from wsiseg_tpu.models.ynet import YNet, init_ynet
from wsiseg_tpu.ops.color import normalize
from wsiseg_tpu.slides import SyntheticSlide

TILE = 64
STRIDE = 32


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    d = tmp_path_factory.mktemp("eval_out")
    return default_config(tile_w=TILE, tile_h=TILE, tile_stride_w=STRIDE,
                          tile_stride_h=STRIDE, compute_dtype="float32",
                          infer_batch_size=8,
                          val_save_pth=str(d / "out"),
                          wsi_mask_pth=str(d / "masks"))


@pytest.fixture(scope="module")
def slide():
    return SyntheticSlide(width=4096, height=3072, num_levels=3, seed=11)


@pytest.fixture(scope="module")
def model_and_vars(cfg):
    return init_ynet(cfg, jax.random.PRNGKey(0), tile_hw=(TILE, TILE))


def test_plan_slide_grid_and_mask(cfg, slide):
    plan = plan_slide("syn", slide, cfg, mask_cache_dir=cfg.wsi_mask_pth)
    assert plan is not None
    assert plan.full_grid_len >= len(plan.grid) > 0
    assert plan.mask.shape == (192, 256)
    # mask cache file written and reused
    assert os.path.exists(os.path.join(cfg.wsi_mask_pth, "syn.png"))
    plan2 = plan_slide("syn", slide, cfg, mask_cache_dir=cfg.wsi_mask_pth)
    np.testing.assert_array_equal(plan.mask, plan2.mask)


def test_dense_stitching_matches_per_tile_loop(cfg, slide, model_and_vars):
    """The engine's gather→forward→scatter-add must equal the reference
    per-tile semantics (utils/eval.py:190-215) computed as an explicit loop."""
    model, variables = model_and_vars
    plan = plan_slide("syn", slide, cfg, mask_cache_dir=cfg.wsi_mask_pth)
    engine = DenseInferenceEngine(model, variables, cfg)
    res = engine.predict_slide(plan, keep_canvas=True)
    assert res.num_tiles == len(plan.grid)

    level_img = slide.read_level(cfg.scan_level)
    h2, w2 = plan.canvas_hw
    expected = np.zeros((h2, w2, cfg.num_classes), np.float32)

    @jax.jit
    def fwd(tile_u8):
        x = tile_u8.astype(jnp.float32)[None] / 255.0
        x = normalize(x, cfg.dataset_mean, cfg.dataset_std)
        return model.apply(variables, x, method=YNet.segment)[0]

    for x0, y0 in zip(plan.grid.xs, plan.grid.ys):
        tile = level_img[y0:y0 + TILE, x0:x0 + TILE]
        expected[y0:y0 + TILE, x0:x0 + TILE] += np.asarray(fwd(jnp.asarray(tile)))

    np.testing.assert_allclose(res.canvas, expected, atol=2e-3, rtol=1e-3)


def test_predict_tumorbed_writes_artifacts(cfg, slide, model_and_vars):
    model, variables = model_and_vars
    coll = SlideCollection([("syn.svs", slide)], cfg,
                           mask_cache_dir=cfg.wsi_mask_pth)
    engine = DenseInferenceEngine(model, variables, cfg)
    out = predict_tumorbed(engine, coll, ep=7, log=lambda s: None)
    rec = out["syn.svs"]
    assert os.path.exists(rec["heatmap"])
    assert os.path.exists(rec["overlay"])
    assert rec["heatmap"].endswith(f"7/syn.svs_{STRIDE}_heatmap.png")
    from PIL import Image
    hm = np.asarray(Image.open(rec["heatmap"]))
    assert hm.shape == (192, 256)
    ov = np.asarray(Image.open(rec["overlay"]))
    assert ov.shape == (192, 256, 3)


def test_predict_wsis_with_gt_artifacts(cfg, slide, model_and_vars, tmp_path):
    """GT rasters on disk (as mk_gt.py would write) → metric report."""
    from PIL import Image
    model, variables = model_and_vars
    # fake slide path with GT artifacts beside it
    spath = str(tmp_path / "cased.svs")
    gt2 = slide.ground_truth(2)
    Image.fromarray(gt2.astype(np.uint8)).save(spath + "_mask.png")
    tb = (gt2 >= 2).astype(np.uint8) * 255
    Image.fromarray(tb).save(spath + "_tumor_bed.png")

    coll = SlideCollection([("cased.svs", slide, spath)], cfg,
                           mask_cache_dir=cfg.wsi_mask_pth)
    engine = DenseInferenceEngine(model, variables, cfg)
    out = predict_wsis(engine, coll, ep=3, log=lambda s: None)
    rec = out["cased.svs"]
    for key in ("acc", "s", "acc_masked", "iou_fg", "iou_tb"):
        assert key in rec
    assert 0.0 <= rec["iou_tb"] <= 1.0
    assert np.isfinite(out["_mean_tb_iou"])
    # color-mask artifact
    assert os.path.exists(os.path.join(cfg.val_save_pth, "3",
                                       f"cased.svs_{STRIDE}.png"))


def test_scan_level_1_matches_per_tile_oracle(cfg, slide, model_and_vars):
    """Dense inference at scan_level != 2 (reference utils/eval.py:45
    stitches at the scan level, :67-71 downsamples to level 2): the level-1
    stitching canvas must equal a per-tile numpy loop at level 1, and the
    output artifacts land at level-2 dims."""
    model, variables = model_and_vars
    cfg1 = cfg.replace(scan_level=1)
    plan = plan_slide("syn", slide, cfg1, mask_cache_dir=None)
    assert plan is not None and len(plan.grid) > 0
    assert plan.stitch_hw == (768, 1024)       # level-1 dims
    assert plan.canvas_hw == (192, 256)        # level-2 dims

    engine = DenseInferenceEngine(model, variables, cfg1)
    res = engine.predict_slide(plan, keep_canvas=True)

    level_img = slide.read_level(1)
    hs, ws = plan.stitch_hw
    expected = np.zeros((hs, ws, cfg1.num_classes), np.float32)

    @jax.jit
    def fwd(tile_u8):
        x = tile_u8.astype(jnp.float32)[None] / 255.0
        x = normalize(x, cfg1.dataset_mean, cfg1.dataset_std)
        return model.apply(variables, x, method=YNet.segment)[0]

    for x0, y0 in zip(plan.grid.xs, plan.grid.ys):
        tile = level_img[y0:y0 + TILE, x0:x0 + TILE]
        expected[y0:y0 + TILE, x0:x0 + TILE] += np.asarray(fwd(jnp.asarray(tile)))

    np.testing.assert_allclose(res.canvas, expected, atol=2e-3, rtol=1e-3)
    # outputs downsampled to level 2
    assert res.labels.shape == (192, 256)
    assert res.heatmap.shape == (192, 256)


def test_fcn_fast_whole_image_path(cfg, slide, model_and_vars):
    """The single-dispatch Pallas-stem FCN path (models/infer_fast) agrees
    with the chunked flax FCN path (interpret mode on CPU)."""
    model, variables = model_and_vars
    plan = plan_slide("syn", slide, cfg, mask_cache_dir=cfg.wsi_mask_pth)
    engine = DenseInferenceEngine(model, variables, cfg)
    assert not engine._fcn_fast_ok()          # CPU: off by default
    engine.fcn_fast_interpret = True
    engine.fcn_fold = True        # fold decoder is opt-in (compile cost)
    assert engine._fcn_fast_ok()

    fast_res = engine.predict_slide_fcn(plan)             # fast path
    flax_res = engine.predict_slide_fcn(plan, chunk=4096, halo=16)
    agree = (fast_res.labels == flax_res.labels).mean()
    assert agree > 0.95, f"fast/flax FCN agreement too low: {agree}"
    assert fast_res.labels.shape == plan.canvas_hw


def test_fcn_fast_nofold_v2_stem_path(cfg, slide, model_and_vars):
    """The DEFAULT whole-image path (fused v2 stem: conv+pool+s2d in one
    kernel, decode_cells tail, fused postprocess dispatch) agrees with
    the chunked flax FCN path (interpret mode on CPU)."""
    model, variables = model_and_vars
    plan = plan_slide("syn", slide, cfg, mask_cache_dir=cfg.wsi_mask_pth)
    engine = DenseInferenceEngine(model, variables, cfg)
    engine.fcn_fast_interpret = True          # nofold is the default
    assert engine._fcn_fast_ok()

    fast_res = engine.predict_slide_fcn(plan)
    flax_res = engine.predict_slide_fcn(plan, chunk=4096, halo=16)
    agree = (fast_res.labels == flax_res.labels).mean()
    assert agree > 0.95, f"v2-stem/flax FCN agreement too low: {agree}"
    assert fast_res.labels.shape == plan.canvas_hw

    # keep_probs exercises the unfused planar path + extras reconstruction
    kp = engine.predict_slide_fcn(plan, keep_probs=True)
    assert kp.probs is not None and kp.probs.shape[:2] == plan.canvas_hw
    agree2 = (kp.labels == fast_res.labels).mean()
    assert agree2 > 0.999


def test_fcn_fast_resnet34(cfg, slide):
    """The fast FCN path covers every BasicBlock encoder, not just
    resnet18 (supports_infer_fast gates on the block class): resnet34's
    (3, 4, 6, 3) stages run the same v2 stem + encode_stages +
    decode_cells pipeline and agree with the chunked flax path."""
    cfg34 = default_config(
        tile_w=TILE, tile_h=TILE, tile_stride_w=STRIDE,
        tile_stride_h=STRIDE, compute_dtype="float32",
        infer_batch_size=8, arch_encoder="resnet34",
        val_save_pth=cfg.val_save_pth, wsi_mask_pth=cfg.wsi_mask_pth)
    model, variables = init_ynet(cfg34, jax.random.PRNGKey(3),
                                 tile_hw=(TILE, TILE))
    plan = plan_slide("syn", slide, cfg34, mask_cache_dir=cfg34.wsi_mask_pth)
    engine = DenseInferenceEngine(model, variables, cfg34)
    engine.fcn_fast_interpret = True
    assert engine._fcn_fast_ok()

    fast_res = engine.predict_slide_fcn(plan)
    flax_res = engine.predict_slide_fcn(plan, chunk=4096, halo=16)
    agree = (fast_res.labels == flax_res.labels).mean()
    assert agree > 0.95, f"resnet34 fast/flax agreement too low: {agree}"


def test_predict_slides_fcn_group_matches_per_slide(cfg, model_and_vars):
    """Multi-slide serving (one fused dispatch per group) returns exactly
    the per-slide results; the pipelined evaluator grouping preserves
    (name, result) pairing."""
    from wsiseg_tpu.infer.evaluators import _pipelined_results

    model, variables = model_and_vars
    slides = [SyntheticSlide(width=4096, height=3072, num_levels=3, seed=s)
              for s in (21, 22)]
    plans = [plan_slide(f"s{k}", s, cfg, mask_cache_dir=None)
             for k, s in enumerate(slides)]
    engine = DenseInferenceEngine(model, variables, cfg)
    engine.fcn_fast_interpret = True

    singles = [engine.predict_slide_fcn(p) for p in plans]
    grouped = engine.predict_slides_fcn(plans)
    for s, g in zip(singles, grouped):
        np.testing.assert_array_equal(s.labels, g.labels)
        np.testing.assert_allclose(s.heatmap, g.heatmap, atol=1e-6)

    # evaluator grouping path (slides_in_flight > 1)
    engine.slides_in_flight = 2

    class _Coll:
        def items(self):
            return [(p.name, p) for p in plans]

    out = list(_pipelined_results(engine, _Coll(), fcn=True))
    assert [n for n, _, _ in out] == ["s0", "s1"]
    for (_, _, res), s in zip(out, singles):
        np.testing.assert_array_equal(res.labels, s.labels)


def test_fcn_oversize_falls_back_to_chunks(cfg, slide, model_and_vars):
    """Slides whose padded pixel count exceeds engine.fcn_fast_max_px are
    routed to halo-padded chunk tiling (default 4096-px chunks) instead of
    OOMing the whole-image fused dispatch; grouped serving degrades to
    per-slide chunked without error."""
    model, variables = model_and_vars
    plan = plan_slide("syn", slide, cfg, mask_cache_dir=None)
    engine = DenseInferenceEngine(model, variables, cfg)
    engine.fcn_fast_interpret = True
    fast = engine.predict_slide_fcn(plan)

    engine.fcn_fast_max_px = 1000            # force the oversize route
    chunked = engine.predict_slide_fcn(plan)
    agree = (fast.labels == chunked.labels).mean()
    assert agree > 0.95, f"oversize-route agreement too low: {agree}"

    res = engine.predict_slides_fcn([plan, plan])
    assert len(res) == 2
    np.testing.assert_array_equal(res[0].labels, chunked.labels)


def test_pipelined_oversize_staging_matches_per_slide(cfg, slide,
                                                      model_and_vars):
    """The production pipelined evaluator stages oversized slides as
    padded HOST images (not device arrays) and routes them through the
    chunked path — results must equal a direct per-slide call."""
    from wsiseg_tpu.infer.evaluators import _pipelined_results
    model, variables = model_and_vars
    coll = SlideCollection([("a", slide), ("b", slide)], cfg,
                           mask_cache_dir=None)
    engine = DenseInferenceEngine(model, variables, cfg)
    engine.fcn_fast_interpret = True
    engine.fcn_fast_max_px = 1000            # every slide is "oversized"
    engine.slides_in_flight = 2
    outs = {n: r for n, _, r in _pipelined_results(engine, coll, fcn=True)}
    assert set(outs) == {"a", "b"}
    ref = engine.predict_slide_fcn(coll.plans["a"])
    np.testing.assert_array_equal(outs["a"].labels, ref.labels)
    np.testing.assert_array_equal(outs["b"].labels, ref.labels)


def test_fcn_mode_agrees_on_interior(cfg, slide, model_and_vars):
    """ScanNet-style FCN output approximates grid overlap-add on tissue
    interior (translation-equivariance up to padding/edge effects)."""
    model, variables = model_and_vars
    plan = plan_slide("syn", slide, cfg, mask_cache_dir=cfg.wsi_mask_pth)
    engine = DenseInferenceEngine(model, variables, cfg)
    grid_res = engine.predict_slide(plan)
    fcn_res = engine.predict_slide_fcn(plan, chunk=128, halo=32)
    assert fcn_res.labels.shape == grid_res.labels.shape
    # compare argmax labels on well-covered tissue pixels
    from wsiseg_tpu.ops.stitch import overlap_count
    cnt = np.asarray(overlap_count(plan.canvas_hw, jnp.asarray(plan.grid.ys),
                                   jnp.asarray(plan.grid.xs), TILE, TILE))
    core = cnt >= 4
    agree = (grid_res.labels[core] == fcn_res.labels[core]).mean()
    assert agree > 0.85, f"FCN/grid agreement too low: {agree}"


def test_postprocess_s2d_matches_threshold_probs(cfg, model_and_vars, rng):
    """The s2d-space postprocess (per-position planes + host interleave)
    equals threshold_probs on the depth_to_space'd logits."""
    from wsiseg_tpu.models.fast_decoder import depth_to_space
    from wsiseg_tpu.ops.threshold import threshold_probs

    model, variables = model_and_vars
    engine = DenseInferenceEngine(model, variables, cfg)
    h2, w2, nc = 16, 24, cfg.num_classes
    y_s = jnp.asarray(rng.randn(h2, w2, 4 * nc).astype(np.float32))
    mask2 = jnp.ones((h2, w2), jnp.uint8)
    labels4, heat4, _ = engine._post_s2d(y_s, mask2)
    hs, ws = 2 * h2, 2 * w2
    labels = engine._interleave4(np.asarray(labels4), hs, ws)
    heat = engine._interleave4(np.asarray(heat4), hs,
                               ws).astype(np.float32) / 255.0

    full = depth_to_space(y_s[None])[0]           # (2h2, 2w2, nc)
    ref_labels, ref_probs = threshold_probs(full, cfg.class_probs)
    np.testing.assert_array_equal(labels, np.asarray(ref_labels))
    ref_heat = np.asarray(ref_probs[..., 2] + ref_probs[..., 3])
    np.testing.assert_allclose(heat, ref_heat, atol=1.0 / 255 + 1e-6)

    # keep_canvas reconstruction equals the d2s'd logits exactly
    _, _, extras = engine._post_s2d(y_s, mask2, keep_canvas=True)
    yp = np.asarray(extras)
    canvas = np.stack(
        [engine._interleave4(
            np.stack([yp[pos * nc + c] for pos in range(4)]), hs, ws)
         for c in range(nc)], axis=-1)
    np.testing.assert_allclose(canvas, np.asarray(full), atol=1e-6)


def test_fcn_fast_slides_in_flight(cfg, slide, model_and_vars):
    """device_throughput(slides_in_flight=2) runs the n-slide fused
    dispatch and reports per-slide steady state (interpret mode)."""
    model, variables = model_and_vars
    plan = plan_slide("syn", slide, cfg, mask_cache_dir=cfg.wsi_mask_pth)
    engine = DenseInferenceEngine(model, variables, cfg)
    engine.fcn_fast_interpret = True
    r1 = engine.device_throughput(plan, mode="fcn", iters=1)
    r2 = engine.device_throughput(plan, mode="fcn", iters=1,
                                  slides_in_flight=2)
    assert r1["sec_per_slide"] > 0 and r2["sec_per_slide"] > 0


def _native_oracle_labels(model, variables, cfg, engine, plan):
    """Whole-image flax YNet.segment on the SAME padded image + the
    softmax/floor/argmax postprocess — the layout-independent oracle for
    the fused fast path (identical global context, so it is valid for
    PSPNet's whole-image pyramid pooling too)."""
    img = engine._read_padded_level(plan)
    x = jnp.asarray(img).astype(jnp.float32)[None] / 255.0
    x = normalize(x, cfg.dataset_mean, cfg.dataset_std)
    seg = jax.jit(lambda v, x: model.apply(v, x, method=YNet.segment))(
        variables, x)[0]
    g = np.asarray(seg, np.float32)
    e = np.exp(g - g.max(-1, keepdims=True))
    pr = e / e.sum(-1, keepdims=True)
    pr = np.where(pr < np.asarray(cfg.class_probs, np.float32), 0.0, pr)
    hs, ws = plan.stitch_hw
    return pr.argmax(-1).astype(np.uint8)[:hs, :ws]


@pytest.mark.parametrize("decoder", ["FPN", "PSPNet", "Linknet"])
def test_fcn_fast_native_decoders(decoder, tmp_path):
    """The whole-image fused FCN fast path covers the non-Unet decoder
    families: FPN/PSPNet run their flax decoders functionally on the
    pyramid inside the single dispatch (models/infer_fast.
    _apply_native_decoder + engine._postprocess_native_planes); Linknet
    runs the s2d cell-domain tail (fast_decoder.decode_linknet_cells)
    sharing the Unet planar head contract. All must match the direct
    flax YNet.segment oracle on the same padded image. Reference twin:
    utils/eval.py:196-200 with the myargs.py:9-10 model_name selection."""
    c = default_config(tile_w=TILE, tile_h=TILE, tile_stride_w=STRIDE,
                       tile_stride_h=STRIDE, compute_dtype="float32",
                       infer_batch_size=8, model_name=decoder,
                       val_save_pth=str(tmp_path / "out"),
                       wsi_mask_pth=str(tmp_path / "masks"))
    model, variables = init_ynet(c, jax.random.PRNGKey(7),
                                 tile_hw=(TILE, TILE))
    s = SyntheticSlide(width=2048, height=1536, num_levels=3, seed=13)
    plan = plan_slide("syn_nat", s, c, mask_cache_dir=None)
    engine = DenseInferenceEngine(model, variables, c)
    engine.fcn_fast_interpret = True
    assert (engine.fast_linknet if decoder == "Linknet"
            else engine.fast_native)
    assert engine._fcn_fast_ok()

    res = engine.predict_slide_fcn(plan)
    oracle = _native_oracle_labels(model, variables, c, engine, plan)
    agree = (res.labels == oracle).mean()
    assert agree > 0.95, f"{decoder} fast/oracle agreement too low: {agree}"
    assert res.labels.shape == plan.canvas_hw

    # keep_canvas routes native decoders through the full-res canvas path
    kc = engine.predict_slide_fcn(plan, keep_canvas=True)
    assert kc.canvas is not None and kc.canvas.shape[:2] == plan.canvas_hw
    agree2 = (kc.labels == res.labels).mean()
    assert agree2 > 0.999


def test_fcn_fast_resnet50_bottleneck(tmp_path):
    """Bottleneck encoders (resnet50/101/152) run the same fused
    whole-image path: v2 Pallas stem + functional Bottleneck stages
    (fast_encoder._bottleneck_block) + the generic decode_cells tail.
    Reference twin: train.py:29 smp.Unet('resnet50')."""
    c = default_config(tile_w=TILE, tile_h=TILE, tile_stride_w=STRIDE,
                       tile_stride_h=STRIDE, compute_dtype="float32",
                       infer_batch_size=8, arch_encoder="resnet50",
                       val_save_pth=str(tmp_path / "out"),
                       wsi_mask_pth=str(tmp_path / "masks"))
    model, variables = init_ynet(c, jax.random.PRNGKey(9),
                                 tile_hw=(TILE, TILE))
    s = SyntheticSlide(width=2048, height=1536, num_levels=3, seed=17)
    plan = plan_slide("syn_r50", s, c, mask_cache_dir=None)
    engine = DenseInferenceEngine(model, variables, c)
    engine.fcn_fast_interpret = True
    assert engine._fcn_fast_ok()

    res = engine.predict_slide_fcn(plan)
    oracle = _native_oracle_labels(model, variables, c, engine, plan)
    agree = (res.labels == oracle).mean()
    assert agree > 0.95, f"resnet50 fast/oracle agreement too low: {agree}"


def test_predict_slides_fcn_native_group(tmp_path):
    """Multi-slide grouped serving works unchanged for a native-layout
    decoder (the plane contract makes the fused runners decoder-agnostic)."""
    c = default_config(tile_w=TILE, tile_h=TILE, tile_stride_w=STRIDE,
                       tile_stride_h=STRIDE, compute_dtype="float32",
                       infer_batch_size=8, model_name="FPN",
                       val_save_pth=str(tmp_path / "out"),
                       wsi_mask_pth=str(tmp_path / "masks"))
    model, variables = init_ynet(c, jax.random.PRNGKey(5),
                                 tile_hw=(TILE, TILE))
    slides = [SyntheticSlide(width=2048, height=1536, num_levels=3, seed=s)
              for s in (31, 32)]
    plans = [plan_slide(f"n{k}", s, c, mask_cache_dir=None)
             for k, s in enumerate(slides)]
    engine = DenseInferenceEngine(model, variables, c)
    engine.fcn_fast_interpret = True

    singles = [engine.predict_slide_fcn(p) for p in plans]
    grouped = engine.predict_slides_fcn(plans)
    for s_res, g_res in zip(singles, grouped):
        np.testing.assert_array_equal(s_res.labels, g_res.labels)
        np.testing.assert_allclose(s_res.heatmap, g_res.heatmap, atol=1e-6)
