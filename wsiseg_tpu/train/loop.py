"""Epoch-driven training loop shared by all trainer CLIs.

One skeleton for the reference's five trainers (SURVEY.md §1.6): epoch loop
over host batches → device step → running metrics → periodic validation and
checkpointing (``validate_model`` / ``save_models`` cadence, myargs.py:73-78).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from wsiseg_tpu.config import Config
from wsiseg_tpu.data.pipeline import prefetch_to_device
from wsiseg_tpu.train.state import TrainState, save_checkpoint

_M64 = 0xFFFFFFFFFFFFFFFF


def _splitmix64(x: int) -> int:
    # Python ints: arbitrary precision, explicit masking (numpy uint64
    # scalars warn on intentional wraparound)
    z = (x + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return (z ^ (z >> 31)) & _M64


def host_step_keys(seed: int, epoch: int, step: int):
    """Two independent threefry key datas (step rng, preprocess rng),
    derived HOST-SIDE: numpy SplitMix64 over a (seed, epoch, step)
    counter, returned as raw ``uint32[2]`` arrays — which every
    jax.random op accepts as keys.

    Why not ``jax.random.split`` in the train loop: each host-loop split
    is ~4 tiny device dispatches (the (3,2) split + unpack slices), and
    over this harness's axon relay tiny dispatches serialize at tens of
    ms each — measured ~140 ms/step of pure rng overhead at b128
    (scripts/exp_r8c.py probe step 312 ms vs the split-per-iter bench
    loop 450 ms). Counter-derived keys ship WITH the batch through the
    prefetch thread instead, so the hot loop issues zero rng dispatches.
    Deterministic per (seed, epoch, step); the stream differs from the
    pre-round-5 chained-split discipline (any fixed derivation is
    equally valid)."""
    if not (0 <= step < (1 << 20) and 0 <= epoch < (1 << 20)
            and 0 <= seed < (1 << 24)):
        # the packing below is 24/20/20 bits — a silent wrap would REUSE
        # a previous step's keys (identical jitter/dropout streams)
        raise ValueError(
            f"host_step_keys counter out of range (seed {seed} < 2^24, "
            f"epoch {epoch} / step {step} < 2^20)")
    base = ((seed << 40) ^ (epoch << 20) ^ step)
    ks = []
    for lane in (0, 1):
        z = _splitmix64(base * 2 + lane)
        ks.append(np.array([z >> 32, z & 0xFFFFFFFF], dtype=np.uint32))
    return ks[0], ks[1]


class Trainer:
    def __init__(self, cfg: Config, state: TrainState, step_fn: Callable,
                 make_batches: Callable[[], Iterable[Dict]],
                 preprocess_batch: Optional[Callable] = None,
                 validate_fn: Optional[Callable] = None,
                 log_fn: Callable[[str], None] = print,
                 mesh=None):
        """
        Args:
          step_fn: (state, batch, rng) -> (state, metrics) — already jitted.
          make_batches: returns a fresh host-batch iterator per epoch.
          preprocess_batch: optional device-side batch transform
            (e.g. uint8→normalized float + jitter), called as
            fn(batch, rng, train=True) INSIDE the host loop but typically
            jitted itself.
          validate_fn: fn(state, epoch) -> dict of metrics.
          mesh: optional jax.sharding.Mesh — data-parallel training: the
            state is replicated, every batch's leading axis is sharded over
            the mesh's first axis, and GSPMD inserts the ICI collectives
            (gradient all-reduce, global BatchNorm statistics). Identical
            math to single-device at equal global batch (the reference has
            no multi-device path at all, SURVEY.md §2.c).
        """
        self.cfg = cfg
        self.state = state
        self.step_fn = step_fn
        self.make_batches = make_batches
        self.preprocess_batch = preprocess_batch
        self.validate_fn = validate_fn
        self.log = log_fn
        self.mesh = mesh
        self.history: list[dict] = []

    def run(self, start_epoch: Optional[int] = None,
            num_epochs: Optional[int] = None) -> TrainState:
        cfg = self.cfg
        start = start_epoch if start_epoch is not None else cfg.start_epoch
        end = start + (num_epochs if num_epochs is not None
                       else cfg.num_epoch - start + 1)
        batch_sh = None
        if self.mesh is not None:
            from wsiseg_tpu.parallel.mesh import (batch_sharding,
                                                  replicate_tree,
                                                  replicated,
                                                  shard_batch_spatial)
            if "space" in self.mesh.axis_names:
                # hybrid data × SPATIAL parallel: images/label maps shard on
                # (batch, height); GSPMD inserts the conv halo exchanges and
                # keeps BatchNorm/loss reductions global — identical math
                n_data = self.mesh.shape[self.mesh.axis_names[0]]
                if cfg.batch_size % n_data:
                    raise ValueError(
                        f"global batch_size {cfg.batch_size} must divide "
                        f"evenly over the {n_data}-way data axis")
                self.state = replicate_tree(self.mesh, self.state)
                mesh = self.mesh
                batch_sh = lambda b: shard_batch_spatial(mesh, b)  # noqa: E731
                self.log(f"data×spatial training over {dict(self.mesh.shape)}"
                         f" ({cfg.batch_size // n_data} per data shard)")
            else:
                n_dev = self.mesh.devices.size
                if cfg.batch_size % n_dev:
                    raise ValueError(
                        f"global batch_size {cfg.batch_size} must divide "
                        f"evenly over {n_dev} mesh devices")
                self.state = replicate_tree(self.mesh, self.state)
                dsh = batch_sharding(self.mesh, self.mesh.axis_names[0])
                rep = replicated(self.mesh)
                # rng keys are (2,) u32 leaves — replicate, never shard
                batch_sh = lambda b: {  # noqa: E731
                    k: jax.device_put(v, rep if k.startswith("rng") else dsh)
                    for k, v in b.items()}
                self.log(f"data-parallel training over {n_dev} devices "
                         f"({cfg.batch_size // n_dev} per device)")

        for epoch in range(start, end):
            t0 = time.time()
            # metric sums stay ON DEVICE during the epoch — a float() per
            # step would force a device sync per batch and serialize the
            # step pipeline (VERDICT r2 weak #7); one fetch at epoch end
            sums: Dict[str, jax.Array] = {}
            count = 0
            n_samples = 0
            # seg labels get their s2d view attached host-side (numpy, runs
            # in the prefetch thread) when the config trains with the s2d
            # decoder tail + s2d-domain loss — the device transpose of the
            # same transform costs 85 ms/batch (data/patches.seg_labels_s2d)
            from wsiseg_tpu.data.patches import add_s2d_seg_labels

            def host_batches(ep):
                # per-step rng keys derived host-side and shipped with the
                # batch (host_step_keys docstring: a host-loop
                # jax.random.split costs ~140 ms/step over the relay)
                for i, b in enumerate(self.make_batches()):
                    b = add_s2d_seg_labels(b, cfg)
                    b["rng_step"], b["rng_pp"] = host_step_keys(
                        cfg.seed, ep, i)
                    yield b

            for batch in prefetch_to_device(host_batches(epoch),
                                            depth=cfg.prefetch_depth,
                                            device=batch_sh):
                sub = batch.pop("rng_step")
                pp = batch.pop("rng_pp")
                if self.preprocess_batch is not None:
                    batch = self.preprocess_batch(batch, pp)
                # device-cached epochs feed {"idx"} batches (no "image");
                # every batch kind has a shared leading sample axis
                lead = batch.get("image", next(iter(batch.values())))
                n_samples += int(lead.shape[0])
                self.state, metrics = self.step_fn(self.state, batch, sub)
                count += 1
                for k, v in metrics.items():
                    sums[k] = v if k not in sums else sums[k] + v

            # fetching the sums drains the device queue, so dt covers the
            # actual compute (not just dispatch)
            avg = {k: float(v) / max(count, 1) for k, v in sums.items()}
            dt = time.time() - t0
            rate = n_samples / dt if dt > 0 else 0.0
            self.log(f"Epoch {epoch}: " +
                     ", ".join(f"{k} {v:.4f}" for k, v in sorted(avg.items())) +
                     f", {rate:.1f} patches/s")
            rec = {"epoch": epoch, **avg, "patches_per_sec": rate}

            if (self.validate_fn is not None and cfg.validate_model > 0
                    and epoch % cfg.validate_model == 0):
                val = self.validate_fn(self.state, epoch) or {}
                rec.update({f"val_{k}": v for k, v in val.items()})
                if val:
                    self.log(f"  val: " +
                             ", ".join(f"{k} {v:.4f}" for k, v in sorted(val.items())))

            if cfg.save_models > 0 and epoch % cfg.save_models == 0:
                pth = save_checkpoint(self.state, cfg, epoch)
                rec["checkpoint"] = pth

            self.history.append(rec)
        return self.state
