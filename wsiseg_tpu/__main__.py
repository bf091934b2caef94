"""``python -m wsiseg_tpu <command> [flags]`` — CLI dispatcher.

Commands mirror the reference's entry scripts (see wsiseg_tpu.cli).
"""

from __future__ import annotations

import sys

COMMANDS = {
    "train": ("wsiseg_tpu.cli.train", "hybrid cls+seg trainer (train.py)"),
    "train-cellularity": ("wsiseg_tpu.cli.train_cellularity",
                          "3-head cls+reg+seg trainer (train_cellularity.py)"),
    "train-ssr": ("wsiseg_tpu.cli.train_ssr",
                  "same-sized-region segmentation trainer (train_ssr.py)"),
    "train-p": ("wsiseg_tpu.cli.train_p",
                "patch classification trainer (train_p.py)"),
    "train-hr": ("wsiseg_tpu.cli.train_hr",
                 "multi-patch region-ensemble trainer (train_hr.py)"),
    "eval": ("wsiseg_tpu.cli.eval", "full-WSI segmentation eval (eval.py)"),
    "eval-tumorbed": ("wsiseg_tpu.cli.eval_tumorbed",
                      "tumor-bed heatmap generation (eval_tumorbed.py)"),
    "eval-spie": ("wsiseg_tpu.cli.eval_spie",
                  "BreastPathQ submission writer (eval_spie.py)"),
    "slic": ("wsiseg_tpu.cli.slic_demo", "SLIC proposal demo (slic.py)"),
    "scannet": ("wsiseg_tpu.cli.scannet_demo",
                "CC proposal demo (scannet.py)"),
    "preprocess": ("wsiseg_tpu.preprocess.__main__",
                   "training-data generators (preprocess/*.py)"),
    "overlay-tb": ("wsiseg_tpu.paper_tools.overlay_tb_wsi",
                   "tumor-bed overlay rendering (paper_tools)"),
    "check-fp": ("wsiseg_tpu.paper_tools.check_for_false_positives",
                 "slide-level FP screening (paper_tools)"),
    "closest-regionproposal": (
        "wsiseg_tpu.paper_tools.closest_regionproposal",
        "region perimeter/keypoint analysis (closest_regionproposal.py)"),
}


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache for every CLI run (opt out with
    WSISEG_COMPILE_CACHE=0; set it to a path to relocate). First compiles
    of the big dense-inference graphs take minutes through a remote
    compile helper on some TPU attachments — the on-disk cache makes every
    later process start warm."""
    import os

    d = os.environ.get("WSISEG_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/jax_comp"))
    if not d or d == "0":
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:           # pragma: no cover - best effort
        pass


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m wsiseg_tpu <command> [flags]\n\ncommands:")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:20s} {desc}")
        return
    cmd = argv[0]
    if cmd not in COMMANDS:
        raise SystemExit(f"unknown command {cmd!r}; "
                         f"try: {', '.join(COMMANDS)}")
    _enable_compile_cache()
    import importlib
    mod = importlib.import_module(COMMANDS[cmd][0])
    mod.main(argv[1:])


if __name__ == "__main__":
    main()
