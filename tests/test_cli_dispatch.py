"""CLI dispatcher (__main__) and flag-parity smoke tests (no training)."""

import subprocess
import sys

import pytest

from wsiseg_tpu.config import parse_args


def test_dispatcher_help():
    r = subprocess.run([sys.executable, "-m", "wsiseg_tpu", "--help"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0
    for cmd in ("train", "train-cellularity", "train-ssr", "train-p",
                "train-hr", "eval", "eval-tumorbed", "eval-spie", "slic",
                "scannet", "preprocess"):
        assert cmd in r.stdout, cmd


def test_dispatcher_unknown_command():
    r = subprocess.run([sys.executable, "-m", "wsiseg_tpu", "nope"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode != 0
    assert "unknown command" in r.stderr


def test_preprocess_dispatcher_lists_generators():
    r = subprocess.run([sys.executable, "-m", "wsiseg_tpu", "preprocess"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0
    for gen in ("mk-gt", "centered", "patch-to-cls", "makedata-ssr",
                "region-proposal-points", "collage"):
        assert gen in r.stdout, gen


def test_reference_flag_names_parse():
    """Flag names/defaults mirror the reference myargs.py (SURVEY §1.1)."""
    cfg = parse_args([
        "--model_name", "FPN", "--arch_encoder", "resnet34",
        "--num_classes", "4", "--optim", "sgd", "--lr", "0.001",
        "--batch_size", "8", "--loss", "dice",
        "--tile_w", "256", "--tile_h", "256",
        "--tile_stride_w", "64", "--tile_stride_h", "64",
        "--scan_level", "2", "--scan_resize", "1",
        "--train_image_pth", "data/x", "--continue_train", "true",
    ])
    assert cfg.model_name == "FPN" and cfg.arch_encoder == "resnet34"
    assert cfg.optim == "sgd" and cfg.loss == "dice"
    assert cfg.tile_w == 256 and cfg.tile_stride_h == 64
    assert cfg.continue_train is True


def test_invalid_flags_rejected():
    with pytest.raises(ValueError):
        parse_args(["--loss", "nope"])
    with pytest.raises(ValueError):
        parse_args(["--model_name", "SegFormer"])


def test_eval_flags_fcn_exclusive():
    """--fcn with --grid/--streamed/--sharded is a loud error (the old
    behavior silently dropped the FCN request and ran the 16x-recompute
    grid path)."""
    from wsiseg_tpu.cli.common import parse_eval_flags
    ns, rest = parse_eval_flags(["--grid"])
    assert not ns.fcn and ns.grid and rest == []
    ns, _ = parse_eval_flags([])
    assert ns.fcn                            # FCN is the default
    for bad in (["--fcn", "--grid"], ["--fcn", "--streamed"],
                ["--fcn", "--sharded"]):
        with pytest.raises(SystemExit):
            parse_eval_flags(bad)


def test_detect_peak_tflops_device_kind_strings():
    """PEAK_TFLOPS matching handles JAX device_kind spellings like
    'TPU v5 lite' / 'TPU v6 lite' (spaces stripped, longest key wins)."""
    from wsiseg_tpu.utils.profiling import detect_peak_tflops as peak

    assert peak(kind="TPU v5 lite") == 197.0
    assert peak(kind="TPU v5litepod") == 197.0
    assert peak(kind="TPU v6 lite") == 918.0
    assert peak(kind="TPU v5p") == 459.0
    assert peak(kind="TPU v4") == 275.0
    assert peak(kind="weird accelerator") == 197.0
