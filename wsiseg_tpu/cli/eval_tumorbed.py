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


def _eval(cfg: Config, mode: str = "seg", fcn: bool = False,
          sharded: bool = False, streamed: bool = False,
          slides_in_flight: int = 1) -> dict:
    model, state, epoch = restore_for_eval(cfg)
    engine = DenseInferenceEngine(model, variables_of(state), cfg, mode=mode)
    engine.slides_in_flight = slides_in_flight
    collection = SlideCollection(cfg.raw_val_pth, cfg)
    from wsiseg_tpu.cli.common import make_eval_mesh
    mesh = make_eval_mesh(cfg) if sharded else None
    return predict_tumorbed(engine, collection, epoch, fcn=fcn, mesh=mesh, streamed=streamed)


def main(argv: Optional[Sequence[str]] = None) -> None:
    from wsiseg_tpu.cli.common import parse_eval_flags
    ns, rest = parse_eval_flags(argv)
    _eval(parse_args(rest), fcn=ns.fcn, sharded=ns.sharded,
          streamed=ns.streamed, slides_in_flight=ns.slides_in_flight)


if __name__ == "__main__":
    main()
