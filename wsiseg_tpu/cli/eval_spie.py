"""SPIE BreastPathQ submission writer — reference ``eval_spie.py``:
restore checkpoint → TTA regression over the test patch folder →
``Ozan_Results_<ep>.csv``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from wsiseg_tpu.cli.common import restore_for_eval, variables_of
from wsiseg_tpu.config import Config, parse_args
from wsiseg_tpu.infer.evaluators import predict_breastpathq


def _eval(cfg: Config, out_dir: str = ".") -> str:
    model, state, epoch = restore_for_eval(cfg)
    if not (cfg.patch_folder and cfg.label_csv_path):
        raise SystemExit("eval-spie requires --patch_folder and --label_csv_path")
    return predict_breastpathq(model, variables_of(state), cfg, epoch,
                               cfg.patch_folder, cfg.label_csv_path,
                               out_dir=out_dir)


def main(argv: Optional[Sequence[str]] = None) -> None:
    print(_eval(parse_args(argv)))


if __name__ == "__main__":
    main()
