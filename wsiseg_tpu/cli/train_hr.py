"""Multi-patch region-ensemble trainer — reference ``train_hr.py``.

MultiPatchResNet over (B, 16, 64, 64, 3) region samples; loss on the
ensemble logits (train_hr.py:62); validation through
``regions.validate_hr`` (train_hr.py:74 → utils/regiontools.py:144-204).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from wsiseg_tpu.cli.common import make_preprocess, setup_hr, variables_of, make_train_mesh
from wsiseg_tpu.config import Config, parse_args
from wsiseg_tpu.data.patches import normalize_batch_images
from wsiseg_tpu.data.regions import HRRegionDataset, validate_hr
from wsiseg_tpu.train.loop import Trainer
from wsiseg_tpu.train.steps import make_hr_train_step


def train(cfg: Config, duplicate_dataset: int = 1) -> Trainer:
    model, tx, state, start_epoch = setup_hr(cfg)

    ds = HRRegionDataset(cfg.train_hr_image_pth, cfg,
                         duplicate_dataset=duplicate_dataset)
    # inverse-ratio class weights from the dataset's observed distribution
    # (the reference records cls_ratios for this purpose, dataset_hr.py:130-133)
    ratios = jnp.asarray(ds.cls_ratios, jnp.float32)
    weights = jnp.where(ratios > 0, 1.0 / jnp.maximum(ratios, 1e-8), 0.0)
    weights = weights / jnp.maximum(weights.max(), 1e-8)

    step = jax.jit(make_hr_train_step(model, tx, cfg, class_weights=weights),
                   donate_argnums=0)   # old state buffers reused in-place

    validate_fn = None
    if cfg.val_hr_image_pth:
        def validate_fn(st, epoch):
            import os
            if not os.path.isdir(cfg.val_hr_image_pth):
                return {}
            try:
                val = HRRegionDataset(cfg.val_hr_image_pth, cfg, eval=True)
            except FileNotFoundError:
                return {}
            variables = variables_of(st)

            @jax.jit
            def forward(images_u8):
                b, p = images_u8.shape[:2]
                flat = normalize_batch_images(
                    images_u8.reshape(b * p, *images_u8.shape[2:]), cfg)
                return model.apply(variables,
                                   flat.reshape(b, p, *flat.shape[1:]))

            out = validate_hr(forward, val, cfg)
            return {"acc": out["acc"]}

    trainer = Trainer(cfg, state, step, mesh=make_train_mesh(cfg),
                      make_batches=lambda: ds.batches(),
                      preprocess_batch=make_preprocess(cfg),
                      validate_fn=validate_fn)
    trainer.run(start_epoch=start_epoch)
    return trainer


def main(argv: Optional[Sequence[str]] = None) -> None:
    train(parse_args(argv, loss="xent"))


if __name__ == "__main__":
    main()
