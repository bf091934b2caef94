"""Hybrid classification+segmentation trainer — reference ``train.py``.

Builds the Y-Net, trains on a gt.npy patch store with mixed cls/seg rows
(routed by per-row task masks instead of boolean indexing), validates with
full-WSI dense inference (reference train.py:108-109 → predict_wsis), and
checkpoints on the ``save_models`` cadence.
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

    preprocess = make_preprocess(cfg)
    make_batches = lambda: ds.batches(drop_remainder=True)  # noqa: E731
    if cfg.device_cache:
        # upload the u8 training set ONCE; epochs then move only (B,) i32
        # index arrays host→device (train/device_cache.py)
        from wsiseg_tpu.train.device_cache import (
            DeviceEpochCache, make_cached_hybrid_train_step)
        if cfg.mesh:
            raise ValueError("--device_cache is a single-device mode "
                             "(the cache lives on one chip); drop --mesh")
        epoch_cache = DeviceEpochCache.build(
            ds.batches(drop_remainder=True), cfg,
            max_bytes=int(cfg.device_cache_gb * 1e9), log=print)
        cstep = jax.jit(make_cached_hybrid_train_step(
            model, tx, cfg, cls_weights=jnp.asarray(wc),
            seg_weights=jnp.asarray(ws)), donate_argnums=0)
        step = lambda st, b, rng: cstep(st, epoch_cache.arrays, b["idx"], rng)  # noqa: E731
        preprocess = None   # normalize+jitter run inside the cached step
        ep_counter = iter(range(10 ** 9))

        def make_batches():
            ep = next(ep_counter)
            return ({"idx": ix} for ix in epoch_cache.index_batches(
                cfg.batch_size, seed=cfg.seed, epoch=ep))

    validate_fn = None
    if cfg.raw_val_pth:
        cache = {}

        def validate_fn(st, epoch):
            import os
            if not os.path.isdir(cfg.raw_val_pth):
                return {}
            from wsiseg_tpu.data.wsi_tiles import SlideCollection
            from wsiseg_tpu.infer.engine import DenseInferenceEngine
            from wsiseg_tpu.infer.evaluators import predict_wsis
            if "collection" not in cache:
                cache["collection"] = SlideCollection(cfg.raw_val_pth, cfg)
                cache["engine"] = DenseInferenceEngine(
                    model, variables_of(st), cfg)
            if not len(cache["collection"]):
                return {}
            # refresh weights without recompiling the jitted passes
            cache["engine"].variables = variables_of(st)
            res = predict_wsis(cache["engine"], cache["collection"], epoch)
            return {"mean_tb_iou": res.get("_mean_tb_iou", float("nan"))}

    trainer = Trainer(cfg, state, step, mesh=make_train_mesh(cfg),
                      make_batches=make_batches,
                      preprocess_batch=preprocess,
                      validate_fn=validate_fn)
    trainer.run(start_epoch=start_epoch)
    return trainer


def main(argv: Optional[Sequence[str]] = None) -> None:
    train(parse_args(argv))


if __name__ == "__main__":
    main()
