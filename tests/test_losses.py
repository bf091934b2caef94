import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from wsiseg_tpu import losses  # noqa: E402


@pytest.fixture
def cls_data(rng):
    logits = rng.randn(16, 4).astype(np.float32)
    targets = rng.randint(0, 4, 16)
    return logits, targets


def test_xent_matches_torch(cls_data):
    logits, targets = cls_data
    ours = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    ref = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(targets))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_xent_class_weights_and_ignore(cls_data):
    logits, targets = cls_data
    targets = targets.copy()
    targets[:4] = -1  # ignored
    w = np.array([1.0, 2.0, 0.5, 1.5], np.float32)
    ours = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                                class_weights=jnp.asarray(w), ignore_index=-1)
    ref = F.cross_entropy(torch.from_numpy(logits),
                          torch.from_numpy(targets).long(),
                          weight=torch.from_numpy(w), ignore_index=-1)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_xent_dense_segmentation(rng):
    logits = rng.randn(2, 8, 8, 4).astype(np.float32)
    targets = rng.randint(0, 4, (2, 8, 8))
    ours = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    ref = F.cross_entropy(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                          torch.from_numpy(targets).long())
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_sample_weight_masks_rows(cls_data):
    logits, targets = cls_data
    sw = np.zeros(16, np.float32)
    sw[:8] = 1.0
    ours = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                                sample_weight=jnp.asarray(sw))
    ref = F.cross_entropy(torch.from_numpy(logits[:8]),
                          torch.from_numpy(targets[:8]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    # all-masked batch must not NaN (jit-friendly multi-task requirement)
    zero = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                                sample_weight=jnp.zeros(16))
    assert np.isfinite(float(zero))


def test_bce_matches_torch(rng):
    p = rng.rand(32).astype(np.float32)
    t = (rng.rand(32) > 0.5).astype(np.float32)
    ours = losses.bce(jnp.asarray(p), jnp.asarray(t))
    ref = F.binary_cross_entropy(torch.from_numpy(p), torch.from_numpy(t))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_focal_reduces_to_xent_at_gamma0(cls_data):
    logits, targets = cls_data
    f0 = losses.focal(jnp.asarray(logits), jnp.asarray(targets), gamma=0.0)
    ce = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(f0), float(ce), rtol=1e-5)
    # higher gamma downweights easy examples → smaller loss
    f2 = losses.focal(jnp.asarray(logits), jnp.asarray(targets), gamma=2.0)
    assert float(f2) < float(f0)


def test_regression_losses_match_torch(rng):
    p = rng.randn(64).astype(np.float32)
    t = rng.randn(64).astype(np.float32)
    tp, tt = torch.from_numpy(p), torch.from_numpy(t)
    np.testing.assert_allclose(
        float(losses.mse(jnp.asarray(p), jnp.asarray(t))),
        float(F.mse_loss(tp, tt)), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.l1(jnp.asarray(p), jnp.asarray(t))),
        float(F.l1_loss(tp, tt)), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.rmse(jnp.asarray(p), jnp.asarray(t))),
        float(torch.sqrt(F.mse_loss(tp, tt))), rtol=1e-5)
    # reference formulas (models/losses.py:59-83)
    e = p - t
    np.testing.assert_allclose(float(losses.logcosh(jnp.asarray(p), jnp.asarray(t))),
                               np.mean(np.log(np.cosh(e + 1e-12))), rtol=1e-4)
    np.testing.assert_allclose(float(losses.xtanh(jnp.asarray(p), jnp.asarray(t))),
                               np.mean(e * np.tanh(e)), rtol=1e-4)
    np.testing.assert_allclose(float(losses.xsigmoid(jnp.asarray(p), jnp.asarray(t))),
                               np.mean(2 * e / (1 + np.exp(-e)) - e), rtol=1e-4)


def test_dice_perfect_prediction_near_zero():
    targets = jnp.asarray(np.random.RandomState(0).randint(0, 4, (2, 16, 16)))
    logits = jax.nn.one_hot(targets, 4) * 50.0
    d = losses.dice(logits, targets)
    assert float(d) < 1e-3
    # uniform prediction is penalized
    worse = losses.dice(jnp.zeros_like(logits), targets)
    assert float(worse) > float(d)


def test_dice_ignore_index_excludes_pixels(rng):
    targets = rng.randint(0, 4, (1, 8, 8)).astype(np.int32)
    # perfect prediction everywhere except a strip we will mark ignored,
    # where the prediction is confidently wrong
    logits = np.array(jax.nn.one_hot(jnp.asarray(targets), 4) * 50.0)
    logits[0, 6:] = np.roll(logits[0, 6:], 1, axis=-1)
    targets_ign = targets.copy()
    targets_ign[0, 6:] = -1
    d_ign = losses.dice(jnp.asarray(logits), jnp.asarray(targets_ign),
                        ignore_index=-1)
    d_noign = losses.dice(jnp.asarray(logits), jnp.asarray(targets))
    # with the wrong strip ignored the loss is near-perfect; without, worse
    assert float(d_ign) < 1e-3
    assert float(d_noign) > float(d_ign) + 0.01


def test_jaccard_and_tversky_orderings(rng):
    targets = jnp.asarray(rng.randint(0, 4, (2, 8, 8)))
    good = jax.nn.one_hot(targets, 4) * 10.0
    bad = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    assert float(losses.jaccard(good, targets)) < float(losses.jaccard(bad, targets))
    assert float(losses.tversky(good, targets)) < float(losses.tversky(bad, targets))


def test_ohem_keeps_hard_fraction(rng):
    logits = rng.randn(32, 4).astype(np.float32)
    targets = rng.randint(0, 4, 32)
    full = losses.ohem(jnp.asarray(logits), jnp.asarray(targets), ratio=1.0,
                       scale_factor=1.0)
    half = losses.ohem(jnp.asarray(logits), jnp.asarray(targets), ratio=0.5,
                       scale_factor=1.0)
    ce = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(full), float(ce), rtol=1e-5)
    assert float(half) >= float(full)  # hardest half has higher mean loss


def test_cent_adds_entropy_term(cls_data):
    logits, targets = cls_data
    cent = losses.conditional_entropy_ce(jnp.asarray(logits), jnp.asarray(targets))
    ce = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    assert float(cent) > float(ce)  # +H(p) > 0 for non-degenerate predictions


def test_factory():
    fn = losses.loss_fn("xent", class_weights=jnp.ones(4))
    out = fn(jnp.zeros((2, 4)), jnp.asarray([0, 1]))
    assert np.isfinite(float(out))
    assert float(losses.loss_fn("zeroloss")(None, None)) == 0.0
    with pytest.raises(KeyError):
        losses.loss_fn("nope")


@pytest.mark.parametrize("name,kwargs,ignore", [
    ("cross_entropy", {}, False),
    ("cross_entropy", {"cw": True, "sw": True}, True),
    ("focal", {}, False),
    ("focal", {"cw": True, "sw": True}, False),
    ("ohem", {}, False),
    ("ohem", {"sw": True}, False),
    ("conditional_entropy_ce", {"cw": True, "sw": True}, False),
    ("dice", {"cw": True, "sw": True, "ignore_index": -1}, True),
    ("jaccard", {"sw": True}, False),
    ("tversky", {"alpha": 0.7, "beta": 1.3}, False),
])
def test_class_major_equals_flat(rng, monkeypatch, name, kwargs, ignore):
    """The lane-efficient class-major spatial paths (used when
    targets.ndim >= 2 and C <= 16) must match the legacy flattened (N, C)
    formulation bit-for-nearly-bit, values AND gradients."""
    B, H, W, C = 3, 9, 11, 4
    logits = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    lo = -1 if ignore else 0
    targets = jnp.asarray(rng.randint(lo, C, (B, H, W)).astype(np.int32))
    kw = dict(kwargs)
    if kw.pop("cw", False):
        kw["class_weights"] = jnp.asarray(rng.rand(C).astype(np.float32))
    if kw.pop("sw", False):
        kw["sample_weight"] = jnp.asarray(rng.rand(B).astype(np.float32))
    fn = getattr(losses, name)

    monkeypatch.setattr(losses, "_use_class_major", lambda *a: True)
    v_cm = float(fn(logits, targets, **kw))
    g_cm = jax.grad(lambda l: fn(l, targets, **kw))(logits)
    monkeypatch.setattr(losses, "_use_class_major", lambda *a: False)
    v_flat = float(fn(logits, targets, **kw))
    g_flat = jax.grad(lambda l: fn(l, targets, **kw))(logits)

    np.testing.assert_allclose(v_cm, v_flat, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(g_cm), np.asarray(g_flat),
                               atol=2e-6)
