"""Train state and checkpointing.

Checkpoints carry ``{epoch, params, batch_stats, opt_state, config}`` — the
same payload the reference persists with ``torch.save({'epoch',
'state_dict', 'optimizer', 'config'})`` (train.py:111-118) — serialized with
flax msgpack. File naming mirrors the reference (``model_<arch>_<epoch>``,
utils/networks.py:9) and resume restores optimizer state and continues at
``epoch + 1`` (utils/networks.py:4-12).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Optional, Tuple

import flax
import flax.struct
import jax
import jax.numpy as jnp
import optax

from wsiseg_tpu.config import Config
from wsiseg_tpu.utils.filesystem import make_folder


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        return cls(params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params),
                   step=jnp.zeros([], jnp.int32))

    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}


def checkpoint_path(model_save_pth: str, arch: str, epoch: int) -> str:
    return os.path.join(model_save_pth, f"model_{arch}_{epoch}.msgpack")


def save_checkpoint(state: TrainState, cfg: Config, epoch: int,
                    arch: Optional[str] = None,
                    directory: Optional[str] = None) -> str:
    arch = arch or cfg.arch_encoder
    directory = directory or cfg.model_save_pth
    make_folder(directory)
    payload = {
        "epoch": epoch,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    pth = checkpoint_path(directory, arch, epoch)
    with open(pth, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    with open(pth + ".config.json", "w") as f:
        json.dump(cfg.asdict(), f, indent=1)
    return pth


def restore_checkpoint(pth: str, template: TrainState) -> Tuple[TrainState, int]:
    """Restore into a structurally-matching template state.

    Returns (state, start_epoch) with start_epoch = saved epoch + 1
    (reference utils/networks.py:10-11).
    """
    with open(pth, "rb") as f:
        raw = f.read()
    target = {
        "epoch": 0,
        "params": template.params,
        "batch_stats": template.batch_stats,
        "opt_state": template.opt_state,
        "step": template.step,
    }
    payload = flax.serialization.from_bytes(target, raw)
    state = template.replace(
        params=payload["params"], batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"], step=payload["step"])
    return state, int(payload["epoch"]) + 1


def latest_checkpoint(pattern_or_dir: str) -> Optional[str]:
    """Find the highest-epoch checkpoint under a dir or glob (the reference's
    ``--train_model_pth data/models/*.pt`` idiom, myargs.py:66-67)."""
    if os.path.isdir(pattern_or_dir):
        pattern = os.path.join(pattern_or_dir, "model_*_*.msgpack")
    else:
        pattern = pattern_or_dir
        if pattern.endswith(".pt"):
            pattern = pattern[:-3] + ".msgpack"
        if not pattern.endswith(".msgpack"):
            pattern += ".msgpack"
    cands = []
    for p in glob.glob(pattern):
        m = re.search(r"_(\d+)\.msgpack$", p)
        if m:
            cands.append((int(m.group(1)), p))
    return max(cands)[1] if cands else None


def load_checkpoint_config(pth: str) -> Optional[Config]:
    cfg_pth = pth + ".config.json"
    if os.path.exists(cfg_pth):
        with open(cfg_pth) as f:
            return Config.fromdict(json.load(f))
    return None
