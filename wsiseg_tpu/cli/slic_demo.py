"""SLIC region-proposal demo pipeline — reference ``slic.py``.

Slide thumbnail → tissue mask → SLIC superpixels (jnp kernel) → per-superpixel
keypoints → region-ensemble inference → class mask painted per superpixel →
``slic_out_mask.png`` + ``slic_out.png`` artifacts.
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

import jax
import numpy as np
from PIL import Image

from wsiseg_tpu.cli.common import restore_for_eval, setup_hr, variables_of
from wsiseg_tpu.config import Config, default_config
from wsiseg_tpu.data.patches import normalize_batch_images
from wsiseg_tpu.ops.slic import mark_boundaries, slic
from wsiseg_tpu.ops.tissue import find_nuclei
from wsiseg_tpu.proposals import (classify_proposals, paint_mask_rgb,
                                  slic_proposals)
from wsiseg_tpu.slides.reader import SlideReader, open_slide

# reference slic.py:21-28
SCAN_LEVEL = 2
NUM_SEGMENTS = 200
COMPACTNESS = 20
SIGMA = 5
US_KMEANS = 4
US = 4


def run_slic_pipeline(slide: SlideReader, wsipath: str, cfg: Config,
                      forward_fn, out_prefix: str = "slic_out",
                      num_segments: int = NUM_SEGMENTS) -> np.ndarray:
    """The full proposal→inference→paint pipeline on an open slide.
    Returns the painted class mask at level-2 resolution."""
    import jax.numpy as jnp

    x, y = slide.level_dimensions[-1]
    wsi = slide.read_level(slide.level_count - 1)
    small = np.asarray(Image.fromarray(wsi).resize((x // US, y // US)))

    labels = np.asarray(slic(jnp.asarray(small), n_segments=num_segments,
                             compactness=COMPACTNESS, sigma=SIGMA))

    # upscale thumb + labels back to level-2 dims (reference slic.py:45-52)
    image = np.asarray(Image.fromarray(small).resize((x, y)))
    labels_up = np.asarray(
        Image.fromarray(labels.astype(np.uint16)).resize((x, y),
                                                         Image.NEAREST))

    metadata = slic_proposals(labels_up, wsipath, scan_level=SCAN_LEVEL,
                              us_kmeans=US_KMEANS)
    pred_mask = classify_proposals(forward_fn, metadata, labels_up.shape,
                                   cfg, slide=slide)

    paint_mask_rgb(pred_mask, cfg.num_classes, downscale=US).save(
        f"{out_prefix}_mask.png")
    boundaries = mark_boundaries(image, labels_up, color=(0, 0, 0))
    Image.fromarray(boundaries).save(f"{out_prefix}.png")
    return pred_mask


def make_hr_forward(model, variables, cfg: Config):
    """Jitted (B, P, h, w, 3) uint8 → ensemble logits."""

    @jax.jit
    def forward(images_u8):
        import jax.numpy as jnp
        x = jnp.asarray(images_u8)
        b, p = x.shape[:2]
        flat = normalize_batch_images(x.reshape(b * p, *x.shape[2:]), cfg)
        _, ens = model.apply(variables, flat.reshape(b, p, *flat.shape[1:]))
        return ens

    return forward


def main(argv: Optional[Sequence[str]] = None) -> None:
    p = argparse.ArgumentParser(description="SLIC proposal demo")
    p.add_argument("svspth")
    p.add_argument("--eval_model_pth", default="data/models/*")
    p.add_argument("--num_segments", type=int, default=NUM_SEGMENTS)
    ns = p.parse_args(argv)

    cfg = default_config(eval_model_pth=ns.eval_model_pth)
    model, state, _ = restore_for_eval(cfg, setup=setup_hr)
    forward = make_hr_forward(model, variables_of(state), cfg)
    slide = open_slide(ns.svspth)
    run_slic_pipeline(slide, ns.svspth, cfg, forward,
                      num_segments=ns.num_segments)


if __name__ == "__main__":
    main()
