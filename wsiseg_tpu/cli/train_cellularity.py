"""Three-head cellularity trainer — reference ``train_cellularity.py``.

Y-Net with classifier + regressor + decoder heads; batch rows route by
is_cls/is_reg/is_seg masks and the three losses sum
(train_cellularity.py:86-108). Optional BreastPathQ CSV validation
(:122-128) when ``patch_folder``/``label_csv_path`` are set.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from wsiseg_tpu.cli.common import (make_preprocess, setup_ynet, variables_of,
                                   make_train_mesh)
from wsiseg_tpu.config import Config, parse_args
from wsiseg_tpu.data.patches import PatchDataset, cls_weights
from wsiseg_tpu.train.loop import Trainer
from wsiseg_tpu.train.steps import make_hybrid_train_step


def train(cfg: Config) -> Trainer:
    model, tx, state, start_epoch = setup_ynet(cfg)

    wc, ws = cls_weights(cfg.train_image_pth, cfg)
    step = jax.jit(make_hybrid_train_step(
        model, tx, cfg, cls_weights=jnp.asarray(wc), seg_weights=jnp.asarray(ws)),
        donate_argnums=0)   # old state buffers reused in-place

    ds = PatchDataset(cfg.train_image_pth, cfg)

    validate_fn = None
    if cfg.patch_folder and cfg.label_csv_path:
        def validate_fn(st, epoch):
            from wsiseg_tpu.infer.evaluators import predict_breastpathq
            pth = predict_breastpathq(model, variables_of(st), cfg, epoch,
                                      cfg.patch_folder, cfg.label_csv_path)
            print(f"wrote submission {pth}")
            return {}
    elif cfg.val_image_pth:
        def validate_fn(st, epoch):
            import os
            if not os.path.isdir(cfg.val_image_pth):
                return {}
            from wsiseg_tpu.infer.evaluators import predict_reg
            try:
                val_ds = PatchDataset(cfg.val_image_pth, cfg, eval=True)
            except FileNotFoundError:
                return {}
            return predict_reg(model, variables_of(st), cfg, val_ds.batches())

    trainer = Trainer(cfg, state, step, mesh=make_train_mesh(cfg),
                      make_batches=lambda: ds.batches(drop_remainder=True),
                      preprocess_batch=make_preprocess(cfg),
                      validate_fn=validate_fn)
    trainer.run(start_epoch=start_epoch)
    return trainer


def main(argv: Optional[Sequence[str]] = None) -> None:
    train(parse_args(argv))


if __name__ == "__main__":
    main()
