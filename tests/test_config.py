import pytest

from wsiseg_tpu.config import Config, default_config, parse_args


def test_defaults_match_reference_flags():
    # Defaults mirror reference myargs.py:9-136.
    c = Config()
    assert c.model_name == "Unet"
    assert c.arch_encoder == "resnet18"
    assert c.num_classes == 4
    assert c.class_probs == (0.0, 0.0, 0.0, 0.0)
    assert c.optim == "adam"
    assert c.lr == 1e-4
    assert c.batch_size == 30
    assert c.loss == "mse"
    assert (c.tile_w, c.tile_h) == (512, 512)
    assert (c.tile_stride_w, c.tile_stride_h) == (128, 128)
    assert c.scan_level == 2
    assert c.scan_resize == 1
    assert c.dataset_mean == (0.485, 0.456, 0.406)
    assert c.dataset_std == (0.229, 0.224, 0.225)
    assert c.epsilon == 1e-8


def test_validation_rejects_unknowns():
    with pytest.raises(ValueError):
        Config(loss="nope")
    with pytest.raises(ValueError):
        Config(optim="sgdx")
    with pytest.raises(ValueError):
        Config(model_name="Transformer")
    with pytest.raises(ValueError):
        Config(num_classes=2)  # class_probs length mismatch


def test_default_config_syncs_class_probs():
    c = default_config(num_classes=2)
    assert c.class_probs == (0.0, 0.0)


def test_roundtrip_dict():
    c = default_config(num_classes=3, lr=0.01)
    d = c.asdict()
    c2 = Config.fromdict(d)
    assert c2 == c


def test_parse_args_cli():
    c = parse_args(["--lr", "0.01", "--num_classes", "2", "--loss", "xent"])
    assert c.lr == 0.01
    assert c.num_classes == 2
    assert c.class_probs == (0.0, 0.0)
    assert c.loss == "xent"


def test_norm_dtype_follows_compute_dtype():
    """The "" sentinel resolves to compute_dtype at construction AND across
    replace(compute_dtype=...) (explicit norm_dtype pins it)."""
    c = default_config()
    assert c.norm_dtype == c.compute_dtype == "bfloat16"
    assert default_config(compute_dtype="float32").norm_dtype == "float32"
    assert c.replace(compute_dtype="float32").norm_dtype == "float32"
    assert c.replace(lr=0.5).norm_dtype == "bfloat16"
    assert (c.replace(compute_dtype="float32", norm_dtype="bfloat16")
            .norm_dtype == "bfloat16")
    assert parse_args(["--norm_dtype", "float32"]).norm_dtype == "float32"


def test_grad_accum_flag():
    """--grad_accum wires microbatch accumulation into every trainer
    (train/steps._make_grads_fn); batch_size must split evenly."""
    import pytest

    assert default_config().grad_accum == 1
    assert parse_args(["--grad_accum", "2"]).grad_accum == 2
    with pytest.raises(ValueError, match="divisible by"):
        parse_args(["--grad_accum", "4", "--batch_size", "30"])
    with pytest.raises(ValueError, match="grad_accum"):
        default_config(grad_accum=0)
