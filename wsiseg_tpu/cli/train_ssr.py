"""Same-sized-region segmentation trainer — reference ``train_ssr.py``.

Pure segmentation on 512×512 region crops with a selectable loss (focal by
default in the reference) plus optional dice (train_ssr.py:45-46); per-epoch
validation reports pixel accuracy and binary (tumor/normal) accuracy
(:106-133).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.cli.common import make_preprocess, setup_ynet, variables_of, make_train_mesh
from wsiseg_tpu.config import Config, parse_args
from wsiseg_tpu.data.ssr import SSR_SIZE, SSRSegDataset
from wsiseg_tpu.models.ynet import YNet
from wsiseg_tpu.train.loop import Trainer
from wsiseg_tpu.train.steps import make_seg_train_step


def validate_ssr(model, variables, cfg: Config, dataset) -> dict:
    """Pixel accuracy + binary accuracy over a validation set
    (reference train_ssr.py:106-133, minus the visualization grids)."""

    @jax.jit
    def run(image):
        seg = model.apply(variables, image, method=YNet.segment)
        return jnp.argmax(seg, -1)

    preprocess = make_preprocess(cfg, train=False)
    accs, baccs = [], []
    for batch in dataset.batches():
        b = preprocess(batch, jax.random.PRNGKey(0))
        pred = np.asarray(run(b["image"]))
        gt = batch["seg_label"]
        accs.append(float(np.mean(pred == gt)))
        baccs.append(float(np.mean((pred > 1) == (gt > 1))))
    return {"acc": float(np.mean(accs)) if accs else 0.0,
            "binary_acc": float(np.mean(baccs)) if baccs else 0.0}


def train(cfg: Config, with_dice: bool = True) -> Trainer:
    model, tx, state, start_epoch = setup_ynet(cfg,
                                               tile_hw=(SSR_SIZE, SSR_SIZE))
    step = jax.jit(make_seg_train_step(model, tx, cfg, with_dice=with_dice),
                   donate_argnums=0)   # old state buffers reused in-place
    ds = SSRSegDataset(cfg.train_image_pth, cfg)

    validate_fn = None
    if cfg.val_image_pth:
        def validate_fn(st, epoch):
            import os
            if not os.path.isdir(cfg.val_image_pth):
                return {}
            try:
                val = SSRSegDataset(cfg.val_image_pth, cfg, eval=True)
            except FileNotFoundError:
                return {}
            return validate_ssr(model, variables_of(st), cfg, val)

    trainer = Trainer(cfg, state, step, mesh=make_train_mesh(cfg),
                      make_batches=lambda: ds.batches(),
                      preprocess_batch=make_preprocess(cfg),
                      validate_fn=validate_fn)
    trainer.run(start_epoch=start_epoch)
    return trainer


def main(argv: Optional[Sequence[str]] = None) -> None:
    cfg = parse_args(argv, loss="focal")
    train(cfg)


if __name__ == "__main__":
    main()
