"""``python -m wsiseg_tpu preprocess <generator> [flags]`` dispatcher."""

from __future__ import annotations

import sys

GENERATORS = {
    "mk-gt": "wsiseg_tpu.preprocess.mk_gt",
    "centered": "wsiseg_tpu.preprocess.mk_traindata_centered",
    "no-tumors": "wsiseg_tpu.preprocess.mk_traindata_no_tumors",
    "patch-to-gt": "wsiseg_tpu.preprocess.patch_to_gt",
    "patch-to-cls": "wsiseg_tpu.preprocess.patch_to_cls",
    "breastpathq-cells": "wsiseg_tpu.preprocess.breastpathq_cells",
    "makedata-ssr": "wsiseg_tpu.preprocess.makedata_ssr",
    "ssr-patch-to-gt": "wsiseg_tpu.preprocess.ssr_patch_to_gt",
    "region-proposal-points": "wsiseg_tpu.preprocess.region_proposal_points",
    "collage": "wsiseg_tpu.preprocess.collage_of_patches",
}


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m wsiseg_tpu preprocess <generator> [flags]\n")
        for name in GENERATORS:
            print(f"  {name}")
        return
    name = argv[0]
    if name not in GENERATORS:
        raise SystemExit(f"unknown generator {name!r}; "
                         f"try: {', '.join(GENERATORS)}")
    import importlib
    importlib.import_module(GENERATORS[name]).main(argv[1:])


if __name__ == "__main__":
    main()
