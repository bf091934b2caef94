"""Shared CLI plumbing: model/state construction, resume, preprocessing."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.config import Config
from wsiseg_tpu.data.patches import normalize_batch_images
from wsiseg_tpu.optim import build_optimizer
from wsiseg_tpu.train.state import (TrainState, latest_checkpoint,
                                    restore_checkpoint)


def setup_ynet(cfg: Config, tile_hw: Optional[Tuple[int, int]] = None):
    """Build Y-Net + optimizer + TrainState, resuming when
    ``cfg.continue_train`` (reference utils/networks.py:4-12 semantics:
    restored epoch + 1). Returns (model, tx, state, start_epoch)."""
    from wsiseg_tpu.models.ynet import init_ynet

    model, variables = init_ynet(cfg, jax.random.PRNGKey(cfg.seed),
                                 tile_hw=tile_hw)
    if cfg.pretrained_pth:
        from wsiseg_tpu.models.torch_import import apply_pretrained
        variables = apply_pretrained(variables, cfg.pretrained_pth,
                                     encoder_name="encoder")
        print(f"grafted pretrained weights from {cfg.pretrained_pth}")
    tx = build_optimizer(cfg)
    state = TrainState.create(variables, tx)
    start_epoch = cfg.start_epoch
    if cfg.continue_train:
        pth = latest_checkpoint(cfg.train_model_pth)
        if pth:
            state, start_epoch = restore_checkpoint(pth, state)
            print(f"resumed from {pth} (epoch {start_epoch})")
    return model, tx, state, start_epoch


def setup_hr(cfg: Config):
    """Build the multi-patch region-ensemble model (reference
    resnets_shift.resnet18, train_hr.py:21-22)."""
    from wsiseg_tpu.data.regions import (HR_NUM_SAMPLES, HR_PATCH_H,
                                         HR_PATCH_W)
    from wsiseg_tpu.models.ensemble import MultiPatchResNet

    model = MultiPatchResNet(arch=cfg.arch_encoder,
                             num_classes=cfg.num_classes,
                             num_patches=HR_NUM_SAMPLES,
                             dtype=jnp.dtype(cfg.compute_dtype),
                             param_dtype=jnp.dtype(cfg.param_dtype))
    dummy = jnp.zeros((1, HR_NUM_SAMPLES, HR_PATCH_H, HR_PATCH_W, 3),
                      jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(cfg.seed), dummy, train=False)
    if cfg.pretrained_pth:
        # reference train_hr.py:21-22 resnet18(pretrained=True) —
        # partial load into the trunk, fc heads stay random
        from wsiseg_tpu.models.torch_import import apply_pretrained
        variables = apply_pretrained(variables, cfg.pretrained_pth,
                                     encoder_name="trunk")
        print(f"grafted pretrained trunk from {cfg.pretrained_pth}")
    tx = build_optimizer(cfg)
    state = TrainState.create(variables, tx)
    start_epoch = cfg.start_epoch
    if cfg.continue_train:
        pth = latest_checkpoint(cfg.train_model_pth)
        if pth:
            state, start_epoch = restore_checkpoint(pth, state)
            print(f"resumed from {pth} (epoch {start_epoch})")
    return model, tx, state, start_epoch


def restore_for_eval(cfg: Config, setup=setup_ynet):
    """Restore the eval checkpoint (reference eval*.py:21-35)."""
    model, tx, state, _ = setup(cfg)
    pth = latest_checkpoint(cfg.eval_model_pth)
    if pth:
        state, epoch = restore_checkpoint(pth, state)
        print(f"restored {pth} (epoch {epoch - 1})")
    else:
        epoch = cfg.start_epoch
        print(f"WARNING: no checkpoint at {cfg.eval_model_pth}; "
              "using fresh weights")
    return model, state, epoch - 1


def make_preprocess(cfg: Config, train: bool = True):
    """Jitted device-side batch preprocessing: uint8 → normalized float
    (+ color jitter when training)."""

    def preprocess(batch, rng):
        out = dict(batch)
        img = batch["image"]
        if img.ndim == 5:
            b, p = img.shape[:2]
            flat = normalize_batch_images(
                img.reshape(b * p, *img.shape[2:]), cfg, rng, train=train)
            out["image"] = flat.reshape(b, p, *flat.shape[1:])
        else:
            out["image"] = normalize_batch_images(img, cfg, rng, train=train)
        return out

    return jax.jit(preprocess)


def parse_eval_flags(argv):
    """Shared mode pre-parser for the eval CLIs. Returns
    (namespace, remaining_argv).

    FCN (ScanNet-style, each output pixel computed once) is the DEFAULT
    dense-inference mode — it is the TPU-native execution of the
    reference's stride-128 sliding-window workload and runs ~7× faster
    per chip. ``--grid`` selects the exact-reference-semantics
    overlap-add path (every stride-128 tile through the net, 16× overlap)
    — kept as the parity ORACLE: its 16× recompute bounds it ~7× below
    the FCN path by construction (round-3 decision; see PARITY.md)."""
    import argparse

    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--grid", action="store_true",
                   help="exact reference overlap-add stitching "
                        "(parity oracle; 16x the FCN compute)")
    p.add_argument("--fcn", action="store_true",
                   help="(default) ScanNet-style FCN mode; flag kept for "
                        "compatibility")
    p.add_argument("--sharded", action="store_true",
                   help="shard each slide's tile stream over all devices")
    p.add_argument("--streamed", action="store_true",
                   help="host-streamed tile decode (level-0/1 scans too "
                        "big for an HBM-resident level image); combines "
                        "with --sharded into the row-sharded canvas path")
    p.add_argument("--slides_in_flight", type=int, default=4,
                   help="FCN fast path: serve up to N consecutive "
                        "same-geometry slides as ONE fused dispatch "
                        "(amortizes fixed per-dispatch cost; measured "
                        "sweep in scripts/exp_r3h.py). 1 disables")
    ns, rest = p.parse_known_args(argv)
    if ns.fcn and (ns.grid or ns.streamed or ns.sharded):
        p.error("--fcn is mutually exclusive with --grid/--streamed/"
                "--sharded (FCN is already the default; drop --fcn)")
    # streamed/sharded run the tile path (grid semantics); otherwise FCN
    # is the default and --grid opts into the parity oracle
    ns.fcn = not (ns.grid or ns.streamed or ns.sharded)
    return ns, rest


def make_eval_mesh(cfg: Config):
    from wsiseg_tpu.parallel.mesh import make_mesh
    return make_mesh(cfg)


def make_train_mesh(cfg: Config):
    """Mesh for multi-device training per the ``--mesh`` flag ("" = off,
    "all" = every device, "N" = first N data-parallel, "NxM" = N-way data ×
    M-way SPATIAL parallel — each device owns a horizontal stripe of every
    tile; see ``parallel.mesh.shard_batch_spatial``). Returns None when
    single-device."""
    if not cfg.mesh or cfg.mesh in ("none", "0", "1"):
        return None
    import jax

    from wsiseg_tpu.parallel.mesh import make_mesh
    if "x" in cfg.mesh:
        nd, ns = (int(s) for s in cfg.mesh.split("x"))
        if nd * ns <= 1:
            return None
        return make_mesh(devices=jax.devices()[:nd * ns], shape=(nd, ns),
                         axes=(cfg.mesh_axes[0], "space"))
    n = jax.device_count() if cfg.mesh == "all" else int(cfg.mesh)
    if n <= 1:
        return None
    return make_mesh(devices=jax.devices()[:n], shape=(n,),
                     axes=(cfg.mesh_axes[0],))


def variables_of(state: TrainState) -> dict:
    return {"params": state.params, "batch_stats": state.batch_stats}
