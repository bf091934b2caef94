"""Reference-accuracy parity runner (BASELINE.md rows 3-5).

This environment has no real slides, no torchvision/smp weights and no GPU,
so the Dice / cellularity-correlation parity targets cannot be *executed*
here — this script stages the complete recipe so the comparison is one
command once the assets exist. See the module docstring of each step and
PARITY.md §"Accuracy parity recipe".

Inputs (all reference-compatible):
  --checkpoint   reference torch checkpoint (.pt from train*.py torch.save,
                 {'epoch', 'state_dict', ...}) OR a bare torchvision/smp
                 state_dict; converted by models/torch_import (tested
                 against in-repo torch replicas for resnet18/50 + Unet/FPN)
  --wsi_dir      directory of *.svs (or .npy/.wsiraw/.tiff) validation
                 slides, reference layout (utils/dataset.py:83-107)
  --xml_dir      matching Aperio/Sedeen annotation XMLs (optional; enables
                 GT rasterization + Dice/IoU — preprocess/mk_gt.py twin)
  --breastpathq  directory of SPIE .tif patches + label CSV (optional;
                 enables the cellularity-correlation row)

Outputs: per-slide tumor-bed IoU / masked pixel accuracy / s-score and the
mean TB IoU (reference utils/eval.py:100-135 metrics), heatmap artifacts
bit-layout-compatible with the reference's (<slide>_<stride>_heatmap.png),
and — with --breastpathq — the prediction CSV plus Pearson/MSE vs labels.

Parity procedure vs the reference implementation:
  1. run the reference repo's eval_tumorbed.py / eval_spie.py on the same
     checkpoint + slides (any CUDA box) and keep its printed metrics and
     heatmap PNGs;
  2. run this script with the same inputs on the TPU host;
  3. compare: per-patch logits agree to fp tolerance (bf16 forward ⇒
     ~1e-2 atol on logits; run with --f32 for ~1e-4), so heatmaps should
     agree within 1/255 per pixel away from probability-threshold
     boundaries, and TB IoU / Dice / correlation to ~1e-3. The grid mode
     (--grid) reproduces the reference's 16×-overlap stitching exactly;
     the default FCN mode is equivalent up to tile-border padding effects
     (VERDICT r2: agreement >0.95 of labeled pixels on synthetic nets).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--wsi_dir", required=True)
    p.add_argument("--xml_dir", default=None)
    p.add_argument("--breastpathq", default=None)
    p.add_argument("--label_csv", default=None)
    p.add_argument("--out", default="parity_out")
    p.add_argument("--grid", action="store_true",
                   help="exact reference stitching (default: FCN)")
    p.add_argument("--f32", action="store_true",
                   help="float32 forward for tight logit tolerance")
    p.add_argument("--arch", default="resnet18")
    ns = p.parse_args(argv)

    import jax

    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.data.wsi_tiles import SlideCollection
    from wsiseg_tpu.infer.engine import DenseInferenceEngine
    from wsiseg_tpu.infer.evaluators import (predict_breastpathq,
                                             predict_wsis)
    from wsiseg_tpu.models.torch_import import apply_pretrained
    from wsiseg_tpu.models.ynet import init_ynet

    dt = "float32" if ns.f32 else "bfloat16"
    cfg = default_config(arch_encoder=ns.arch, compute_dtype=dt,
                         norm_dtype=dt, raw_val_pth=ns.wsi_dir,
                         val_save_pth=ns.out,
                         wsi_mask_pth=os.path.join(ns.out, "masks"))
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    variables = apply_pretrained(variables, ns.checkpoint)
    print(f"grafted {ns.checkpoint}")

    if ns.xml_dir:
        # GT artifacts (mk_gt twin) so predict_wsis can compute TB IoU;
        # mk_gt expects XMLs next to the slides (reference layout) — pass
        # --xml_dir=aperio|sedeen to select the annotation format
        from wsiseg_tpu.preprocess.mk_gt import generate as mk_gt
        fmt = ns.xml_dir if ns.xml_dir in ("aperio", "sedeen") else "aperio"
        mk_gt(ns.wsi_dir, cfg, fmt=fmt)

    engine = DenseInferenceEngine(model, variables, cfg)
    collection = SlideCollection(ns.wsi_dir, cfg)
    res = predict_wsis(engine, collection, ep="parity", fcn=not ns.grid)
    print(json.dumps({k: v for k, v in res.items()}, default=str, indent=2))

    if ns.breastpathq and ns.label_csv:
        csv_out = predict_breastpathq(model, variables, cfg, "parity",
                                      ns.breastpathq, ns.label_csv,
                                      out_dir=ns.out)
        print(f"submission CSV: {csv_out}")
        from wsiseg_tpu.preprocess.patch_to_cls import read_label_csv
        gt = read_label_csv(ns.label_csv)
        import csv as _csv
        with open(csv_out) as f:
            rd = _csv.reader(f)
            next(rd)
            pred = {(int(r[0]), int(r[1])): float(r[2]) for r in rd}
        pairs = [(gt[k], v) for k, v in pred.items() if k in gt]
        a = np.array([x for x, _ in pairs])
        b = np.array([y for _, y in pairs])
        print(json.dumps({
            "n": len(pairs),
            "pearson_r": float(np.corrcoef(a, b)[0, 1]),
            "mse": float(np.mean((a - b) ** 2)),
        }))


if __name__ == "__main__":
    main()
