"""CLI parity layer — entry points named/flagged like the reference scripts.

Reference script        →  module / ``python -m wsiseg_tpu <cmd>``
------------------------------------------------------------------
train.py                →  wsiseg_tpu.cli.train            (train)
train_cellularity.py    →  wsiseg_tpu.cli.train_cellularity (train-cellularity)
train_ssr.py            →  wsiseg_tpu.cli.train_ssr        (train-ssr)
train_p.py              →  wsiseg_tpu.cli.train_p          (train-p)
train_hr.py             →  wsiseg_tpu.cli.train_hr         (train-hr)
eval.py                 →  wsiseg_tpu.cli.eval             (eval)
eval_tumorbed.py        →  wsiseg_tpu.cli.eval_tumorbed    (eval-tumorbed)
eval_spie.py            →  wsiseg_tpu.cli.eval_spie        (eval-spie)
slic.py                 →  wsiseg_tpu.cli.slic_demo        (slic)
scannet.py              →  wsiseg_tpu.cli.scannet_demo     (scannet)
preprocess/*.py         →  wsiseg_tpu.preprocess.*         (preprocess-*)
paper_tools/*.py        →  wsiseg_tpu.paper_tools.*
"""
