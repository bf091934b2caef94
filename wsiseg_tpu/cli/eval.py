"""Full-WSI segmentation evaluation — reference ``eval.py``.

Restores a checkpoint, plans every slide under ``raw_val_pth`` (and
``raw_val1_pth`` when set), and runs dense inference + metrics
(predict_wsis). The reference's stale ``predict_wsi`` call (eval.py:50) is
intentionally not replicated (SURVEY.md quirks).
"""

from __future__ import annotations

from typing import Optional, Sequence

from wsiseg_tpu.cli.common import restore_for_eval, variables_of
from wsiseg_tpu.config import Config, parse_args
from wsiseg_tpu.data.wsi_tiles import SlideCollection
from wsiseg_tpu.infer.engine import DenseInferenceEngine
from wsiseg_tpu.infer.evaluators import predict_wsis
from wsiseg_tpu.train.state import TrainState


def _eval(cfg: Config, fcn: bool = False, sharded: bool = False,
          streamed: bool = False, slides_in_flight: int = 1) -> dict:
    model, state, epoch = restore_for_eval(cfg)
    engine = DenseInferenceEngine(model, variables_of(state), cfg)
    engine.slides_in_flight = slides_in_flight
    from wsiseg_tpu.cli.common import make_eval_mesh
    mesh = make_eval_mesh(cfg) if sharded else None
    results = {}
    for src in filter(None, [cfg.raw_val_pth, cfg.raw_val1_pth]):
        collection = SlideCollection(src, cfg)
        if len(collection):
            results.update(predict_wsis(engine, collection, epoch, fcn=fcn,
                                        mesh=mesh, streamed=streamed))
    return results


def main(argv: Optional[Sequence[str]] = None) -> None:
    from wsiseg_tpu.cli.common import parse_eval_flags
    ns, rest = parse_eval_flags(argv)
    _eval(parse_args(rest), fcn=ns.fcn, sharded=ns.sharded,
          streamed=ns.streamed, slides_in_flight=ns.slides_in_flight)


if __name__ == "__main__":
    main()
