"""Whole-image dense-inference forward: Pallas stem + functional Y-Net.

The FCN fast path for single-chunk slides (the default engine geometry,
``DenseInferenceEngine.predict_slide_fcn(chunk=None)``): the uint8 level
image is uploaded raw and packed ON DEVICE for the fused Pallas stem
(:mod:`wsiseg_tpu.ops.pallas_stem` — normalize+7×7/2 conv+BN+ReLU at ~2.7×
XLA's conv lowering), then the remaining encoder stages and the s2d-tail
decoder run as one functional jit from the SAME trained variables.

Numerics: the stem's implicit padding uses the per-channel uint8 value
closest to normalized zero (≈ 255·mean), matching the flax path's
zero-padding in normalized space to <0.5/255/std — differences vs
``YNet.segment`` are confined to fp noise plus a sub-quantization pad
residual at the outermost border (the engine's ≥128 px slide halo is
cropped away anyway).

Capability twin of reference utils/eval.py:196-200 (encoder→decoder dense
eval). Covers every reference (encoder, decoder) family: BasicBlock
(resnet18/34) and Bottleneck (resnet50/101/152) encoders; Unet and Linknet
run exact s2d cell-domain tails (models/fast_decoder.decode_cells /
decode_linknet_cells), while FPN/PSPNet run their flax decoders
functionally on the whole-image feature pyramid inside the same single jit
(native full-res logits out).
Note PSPNet's pyramid pooling spans the WHOLE image here — as in any FCN
execution of a global-pooling decoder, its receptive field differs from
tiled eval (the chunked engine fallback has the same property per chunk).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.models.fast_decoder import (decode_cells,
                                            decode_fold)
from wsiseg_tpu.models.fast_encoder import (encode_stages,
                                            encode_stages_fold)
from wsiseg_tpu.models.resnet import ENCODER_SPECS, BasicBlock
from wsiseg_tpu.ops.pallas_stem import (fold_stem_weights, stem_conv,
                                        stem_geometry)


#: decoders whose fast path emits NATIVE-layout (H, W, nc) logits (the
#: flax decoder applied functionally on the whole-image pyramid). Unet and
#: Linknet instead run s2d cell-domain tails emitting s2d(4) head planes
#: (fast_decoder.decode_cells / decode_linknet_cells).
NATIVE_DECODERS = ("FPN", "PSPNet")


def supports_infer_fast(model) -> bool:
    return (model.arch in ENCODER_SPECS
            and model.decoder in ("Unet", "Linknet") + NATIVE_DECODERS)


def _apply_native_decoder(variables, feats, decoder: str):
    """Run a non-Unet flax decoder functionally on the feature pyramid
    (same trained variables; num_classes read from the head kernel's
    static shape). Returns (H, W, nc) float32 logits, batch removed."""
    from wsiseg_tpu.models.decoders import (FPNDecoder, LinknetDecoder,
                                            PSPDecoder)

    dp = variables["params"]["decoder"]
    nc = dp["seg_head"]["kernel"].shape[-1]
    cls = {"FPN": FPNDecoder, "PSPNet": PSPDecoder,
           "Linknet": LinknetDecoder}[decoder]
    dec = cls(num_classes=nc, dtype=jnp.bfloat16)
    seg = dec.apply(
        {"params": dp, "batch_stats": variables["batch_stats"]["decoder"]},
        feats, train=False)
    return seg[0]


def pack_for_stem(img_u8: np.ndarray, mean) -> np.ndarray:
    """Host-side packing of an (H, W, 3) uint8 image (H, W even) into the
    Pallas-stem layout (Hin, 6, Wc) — cell elements on the middle axis,
    cells on the minor axis — adding the stem's 3-px support ring with the
    normalized-zero pad value (≈255·mean per channel). The kernel wants
    8 sublanes; the 6→8 pad happens on device (33% fewer relay bytes)."""
    h, w = img_u8.shape[:2]
    hin, wc, _ = stem_geometry(h // 2, w // 2)
    pad_rgb = np.clip(np.round(255.0 * np.asarray(mean)), 0,
                      255).astype(np.uint8)
    win = 2 * wc
    out = np.empty((hin, win, 3), np.uint8)
    out[:] = pad_rgb
    out[3:3 + min(h, hin - 3), 3:3 + min(w, win - 3)] = \
        img_u8[:hin - 3, :win - 3]
    return np.ascontiguousarray(out.reshape(hin, wc, 6).transpose(0, 2, 1))


def pack_for_stem_device(img_u8, mean, h: int, w: int):
    """Device-side twin of :func:`pack_for_stem`: (H, W, 3) uint8 on
    device → (Hin, 8, Wc) stem layout. Uploading the RAW image and
    packing on device moves ~16 MB/slide off the host→device link (the
    packed layout is 8/6 larger) and replaces a host numpy transpose
    with a ~ms XLA one."""
    hin, wc, _ = stem_geometry(h // 2, w // 2)
    win = 2 * wc
    pad_rgb = jnp.clip(jnp.round(255.0 * jnp.asarray(mean)), 0,
                       255).astype(jnp.uint8)
    canvas = jnp.broadcast_to(pad_rgb, (hin, win, 3))
    img = img_u8[:hin - 3, :win - 3]
    canvas = jax.lax.dynamic_update_slice(canvas, img, (3, 3, 0))
    packed = canvas.reshape(hin, wc, 6).transpose(0, 2, 1)
    return jnp.pad(packed, ((0, 0), (0, 2), (0, 0)))


def pack_for_stem2(img_u8: np.ndarray, mean) -> np.ndarray:
    """Host-side packing for the FUSED v2 stem
    (:func:`wsiseg_tpu.ops.pallas_stem.stem_pool_conv`): quarter-res
    cells of 4 pixels × 3 channels on the middle axis (12 of 16 rows
    used; the 12→16 pad happens on device), cells on the minor axis."""
    from wsiseg_tpu.ops.pallas_stem import stem2_geometry

    h, w = img_u8.shape[:2]
    hin, wc4, _ = stem2_geometry(h // 2, w // 2)
    pad_rgb = np.clip(np.round(255.0 * np.asarray(mean)), 0,
                      255).astype(np.uint8)
    win = 4 * wc4
    out = np.empty((hin, win, 3), np.uint8)
    out[:] = pad_rgb
    out[3:3 + min(h, hin - 3), 3:3 + min(w, win - 3)] = \
        img_u8[:hin - 3, :win - 3]
    return np.ascontiguousarray(out.reshape(hin, wc4, 12).transpose(0, 2, 1))


def pack_for_stem2_device(img_u8, mean, h: int, w: int):
    """Device-side twin of :func:`pack_for_stem2` → (Hin, 16, Wc4)."""
    from wsiseg_tpu.ops.pallas_stem import stem2_geometry

    hin, wc4, _ = stem2_geometry(h // 2, w // 2)
    win = 4 * wc4
    pad_rgb = jnp.clip(jnp.round(255.0 * jnp.asarray(mean)), 0,
                       255).astype(jnp.uint8)
    canvas = jnp.broadcast_to(pad_rgb, (hin, win, 3))
    img = img_u8[:hin - 3, :win - 3]
    canvas = jax.lax.dynamic_update_slice(canvas, img, (3, 3, 0))
    packed = canvas.reshape(hin, wc4, 12).transpose(0, 2, 1)
    return jnp.pad(packed, ((0, 0), (0, 4), (0, 0)))


@partial(jax.jit, static_argnames=("arch", "h", "w", "interpret", "fold",
                                   "planar_head", "fold_encoder",
                                   "use_chain", "decoder"))
def _segment_raw(variables, img_u8, dataset_mean, dataset_std,
                 *, arch: str, h: int, w: int,
                 interpret: bool = False, fold: bool = False,
                 planar_head: bool = False, fold_encoder: bool = False,
                 use_chain: bool = False, decoder: str = "Unet"):
    """One-jit whole-image forward from the RAW (H, W, 3) uint8 image:
    device-side stem packing + :func:`_segment_packed`'s body. The
    non-fold path packs for the fused v2 stem."""
    packed = (pack_for_stem_device(img_u8, dataset_mean, h, w) if fold
              else pack_for_stem2_device(img_u8, dataset_mean, h, w))
    return _segment_from_packed(
        variables, packed, dataset_mean, dataset_std, arch=arch, h=h,
        w=w, interpret=interpret, fold=fold, planar_head=planar_head,
        fold_encoder=fold_encoder, use_chain=use_chain, decoder=decoder)


@partial(jax.jit, static_argnames=("arch", "h", "w", "interpret", "fold",
                                   "planar_head", "fold_encoder",
                                   "use_chain", "decoder"))
def _segment_packed(variables, img_packed, dataset_mean, dataset_std,
                    *, arch: str, h: int, w: int,
                    interpret: bool = False, fold: bool = False,
                    planar_head: bool = False, fold_encoder: bool = False,
                    use_chain: bool = False, decoder: str = "Unet"):
    return _segment_from_packed(
        variables, img_packed, dataset_mean, dataset_std, arch=arch,
        h=h, w=w, interpret=interpret, fold=fold,
        planar_head=planar_head, fold_encoder=fold_encoder,
        use_chain=use_chain, decoder=decoder)


def _segment_from_packed(variables, img_packed, dataset_mean, dataset_std,
                         *, arch: str, h: int, w: int,
                         interpret: bool = False, fold: bool = False,
                         planar_head: bool = False,
                         fold_encoder: bool = False,
                         use_chain: bool = False, decoder: str = "Unet"):
    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    block_cls, stages = ENCODER_SPECS[arch]
    bottleneck = block_cls is not BasicBlock
    assert decoder == "Unet" or not fold, \
        "the fold (conv-chain) decoder is Unet-only"

    if img_packed.shape[1] in (12, 16):
        # FUSED v2 stem path (quarter-cell packing): conv+BN+ReLU+maxpool
        # + s2d-layout c1 in ONE kernel — native c1 is never materialized
        # (~800 MB less HBM traffic/slide on the ~140 GB/s relay chip)
        from wsiseg_tpu.ops.pallas_stem import (fold_stem_weights2,
                                                stem_pool_conv)

        if img_packed.shape[1] == 12:
            img_packed = jnp.pad(img_packed, ((0, 0), (0, 4), (0, 0)))
        w336, bias2 = fold_stem_weights2(
            ep["stem_conv"]["kernel"], ep["stem_bn"]["scale"],
            ep["stem_bn"]["bias"], eb["stem_bn"]["mean"],
            eb["stem_bn"]["var"], dataset_mean, dataset_std)
        c1s2d, pool = stem_pool_conv(img_packed, w336, bias2,
                                     h // 2, w // 2,
                                     interpret=interpret)
        half = h // 4
        c1s2d = c1s2d[:half][None]      # s2d(c1), emitted by the kernel
        feats = encode_stages(ep, eb, None, stages, jnp.bfloat16,
                              pooled=pool[:half][None],
                              bottleneck=bottleneck)
        if decoder == "Linknet":
            # s2d cell-domain Linknet tail: block3's residual skip IS
            # space_to_depth(c1), which the stem kernel emits — zero
            # relayout (fast_decoder.decode_linknet_cells)
            from wsiseg_tpu.models.fast_decoder import decode_linknet_cells
            return decode_linknet_cells(variables, feats, jnp.bfloat16,
                                        s2d_head=planar_head,
                                        skip3_s2d=c1s2d)[0]
        if decoder != "Unet":
            return _apply_native_decoder(variables, feats, decoder)
        if planar_head:
            return decode_cells(variables, feats, jnp.bfloat16,
                                s2d_head=True, skip3_s2d=c1s2d)[0]
        return decode_cells(variables, feats, jnp.bfloat16,
                            skip3_s2d=c1s2d)[0]

    if img_packed.shape[1] == 6:
        img_packed = jnp.pad(img_packed, ((0, 0), (0, 2), (0, 0)))

    w147, bias = fold_stem_weights(
        ep["stem_conv"]["kernel"], ep["stem_bn"]["scale"],
        ep["stem_bn"]["bias"], eb["stem_bn"]["mean"], eb["stem_bn"]["var"],
        dataset_mean, dataset_std)
    c1 = stem_conv(img_packed, w147, bias, h // 2, w // 2,
                   interpret=interpret)[: h // 2][None]  # (1, H/2, W/2, 64)

    if fold and h % 32 == 0 and w % 32 == 0:
        if fold_encoder:
            feats = encode_stages_fold(ep, eb, c1, stages, jnp.bfloat16,
                                       interpret=interpret)
        else:
            # measured: the fold encoder loses to XLA at slide scale
            # (36.5 vs 24.6 ms) — chains win in the decoder only
            feats = encode_stages(ep, eb, c1, stages, jnp.bfloat16)
        if planar_head:
            # (4·nc, h/2, w/2) planar s2d logits (no depth_to_space)
            return decode_fold(variables, feats, jnp.bfloat16,
                               planar_head=True, use_chain=use_chain,
                               interpret=interpret)
        return decode_fold(variables, feats, jnp.bfloat16,
                           use_chain=use_chain, interpret=interpret)[0]
    feats = encode_stages(ep, eb, c1, stages, jnp.bfloat16,
                          bottleneck=bottleneck)
    if decoder == "Linknet":
        from wsiseg_tpu.models.fast_decoder import decode_linknet_cells
        return decode_linknet_cells(variables, feats, jnp.bfloat16,
                                    s2d_head=planar_head)[0]
    if decoder != "Unet":
        return _apply_native_decoder(variables, feats, decoder)
    if planar_head:
        return decode_cells(variables, feats, jnp.bfloat16,
                            s2d_head=True)[0]
    return decode_cells(variables, feats, jnp.bfloat16)[0]


def segment_whole_image(model, variables, img_u8: np.ndarray,
                        dataset_mean, dataset_std,
                        interpret: bool = False,
                        fold: bool = False,
                        planar_head: bool = False) -> jnp.ndarray:
    """Dense segmentation logits for one (H, W, 3) uint8 image (H, W even,
    W/2 lane-aligned). Returns (H, W, num_classes) float32 on device.
    ``fold=True`` routes layer 1 + decoder blocks 2-4 through the fused
    Pallas conv-chain kernels (requires H, W multiples of 32; Unet only).
    Non-Unet decoders always return native-layout logits (``planar_head``
    and ``fold`` are ignored)."""
    h, w = img_u8.shape[:2]
    native = model.decoder in NATIVE_DECODERS       # FPN/PSPNet
    return _segment_raw(variables, jnp.asarray(np.asarray(img_u8)),
                        tuple(dataset_mean), tuple(dataset_std),
                        arch=model.arch, h=h, w=w, interpret=interpret,
                        fold=fold and model.decoder == "Unet",
                        planar_head=planar_head and not native,
                        decoder=model.decoder)
