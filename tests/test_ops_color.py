import colorsys

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.ops import color


def test_rgb_to_hsv_matches_colorsys(rng):
    rgb = rng.rand(64, 3).astype(np.float32)
    ours = np.asarray(color.rgb_to_hsv(jnp.asarray(rgb)))
    for i in range(64):
        h, s, v = colorsys.rgb_to_hsv(*rgb[i])
        np.testing.assert_allclose(ours[i], [h, s, v], atol=1e-5)


def test_hsv_roundtrip(rng):
    rgb = rng.rand(32, 32, 3).astype(np.float32)
    back = color.hsv_to_rgb(color.rgb_to_hsv(jnp.asarray(rgb)))
    np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-4)


def test_rgb_to_lab_known_values():
    # Reference Lab values (D65, 2°): white=(100,0,0), black=(0,0,0),
    # sRGB red=(53.24, 80.09, 67.20) — standard colorimetry tables.
    pts = jnp.asarray([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    lab = np.asarray(color.rgb_to_lab(pts))
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.05)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.05)
    np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.1)


def test_normalize_roundtrip(rng):
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    img = rng.rand(8, 8, 3).astype(np.float32)
    n = color.normalize(jnp.asarray(img), mean, std)
    # spot-check the math
    np.testing.assert_allclose(
        np.asarray(n)[0, 0], (img[0, 0] - np.array(mean)) / np.array(std), rtol=1e-5)
    d = color.denormalize(n, mean, std)
    np.testing.assert_allclose(np.asarray(d), img, atol=1e-5)


def test_color_jitter_bounds_and_determinism(rng):
    img = rng.rand(16, 16, 3).astype(np.float32)
    key = jax.random.PRNGKey(3)
    a = color.color_jitter(jnp.asarray(img), key)
    b = color.color_jitter(jnp.asarray(img), key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(a).min() >= 0.0 and np.asarray(a).max() <= 1.0
    # different key → different image
    c = color.color_jitter(jnp.asarray(img), jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_batch_color_jitter_independent(rng):
    img = np.repeat(rng.rand(1, 8, 8, 3), 4, axis=0).astype(np.float32)
    out = np.asarray(color.batch_color_jitter(jnp.asarray(img), jax.random.PRNGKey(0)))
    # same input image, different per-sample keys → different outputs
    assert not np.allclose(out[0], out[1])
