"""Tumor-bed heatmap generation over validation WSIs — reference
``eval_tumorbed.py``: restore checkpoint → plan slides → dense inference →
``<slide>_<stride>_heatmap.png`` + overlay artifacts (predict_tumorbed).
"""

from __future__ import annotations

from typing import Optional, Sequence

from wsiseg_tpu.cli.common import restore_for_eval, variables_of
from wsiseg_tpu.config import Config, parse_args
from wsiseg_tpu.data.wsi_tiles import SlideCollection
from wsiseg_tpu.infer.engine import DenseInferenceEngine
from wsiseg_tpu.infer.evaluators import predict_tumorbed


def _eval(cfg: Config, mode: str = "seg", fcn: bool = False) -> dict:
    model, state, epoch = restore_for_eval(cfg)
    engine = DenseInferenceEngine(model, variables_of(state), cfg, mode=mode)
    collection = SlideCollection(cfg.raw_val_pth, cfg)
    return predict_tumorbed(engine, collection, epoch, fcn=fcn)


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--fcn", action="store_true",
                   help="ScanNet-style FCN mode (each pixel computed once)")
    ns, rest = p.parse_known_args(argv)
    _eval(parse_args(rest), fcn=ns.fcn)


if __name__ == "__main__":
    main()
