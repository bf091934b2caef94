"""Pure patch-classification trainer — reference ``train_p.py``.

The reference instantiates a pretrainedmodels backbone with a replaced
final linear (train_p.py:26-27); here the same capability is the Y-Net
encoder + classifier head trained through ``YNet.classify``. Per-epoch
validation prints confusion-matrix / classwise accuracy (train_p.py:82-113).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.cli.common import make_preprocess, setup_ynet, variables_of, make_train_mesh
from wsiseg_tpu.config import Config, parse_args
from wsiseg_tpu.data.patches import PatchDataset, cls_weights
from wsiseg_tpu.infer.evaluators import predict_cls
from wsiseg_tpu.models.ynet import YNet
from wsiseg_tpu.train.loop import Trainer
from wsiseg_tpu.train.steps import make_cls_train_step


def train(cfg: Config) -> Trainer:
    model, tx, state, start_epoch = setup_ynet(cfg)

    wc, _ = cls_weights(cfg.train_image_pth, cfg, ignore_seg=True)
    step = jax.jit(make_cls_train_step(
        model, tx, cfg, class_weights=jnp.asarray(wc), method=YNet.classify),
        donate_argnums=0)   # old state buffers reused in-place

    ds = PatchDataset(cfg.train_image_pth, cfg, duplicate_dataset=10)

    validate_fn = None
    if cfg.val_image_pth:
        def validate_fn(st, epoch):
            import os
            if not os.path.isdir(cfg.val_image_pth):
                return {}
            try:
                val = PatchDataset(cfg.val_image_pth, cfg, eval=True)
            except FileNotFoundError:
                return {}
            out = predict_cls(model, variables_of(st), cfg, val.batches())
            return {"acc": out["acc"], "f1": out["f1"]}

    trainer = Trainer(cfg, state, step, mesh=make_train_mesh(cfg),
                      make_batches=lambda: ds.batches(drop_remainder=True),
                      preprocess_batch=make_preprocess(cfg),
                      validate_fn=validate_fn)
    trainer.run(start_epoch=start_epoch)
    return trainer


def main(argv: Optional[Sequence[str]] = None) -> None:
    train(parse_args(argv, loss="xent"))


if __name__ == "__main__":
    main()
