import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from wsiseg_tpu.ops import morphology as morph


def _rand_mask(rng, shape=(48, 64), p=0.3):
    return (rng.rand(*shape) < p).astype(np.uint8)


def test_dilate_erode_match_scipy(rng):
    m = _rand_mask(rng)
    for size in (2, 3, 5):
        selem = np.ones((size, size), bool)
        ours_d = np.asarray(morph.dilate(jnp.asarray(m), size))
        ours_e = np.asarray(morph.erode(jnp.asarray(m), size))
        # reduce_window SAME padding centers even windows like scipy origin=0
        ref_d = ndi.binary_dilation(m, structure=selem).astype(np.uint8)
        ref_e = ndi.binary_erosion(m, structure=selem, border_value=0).astype(np.uint8)
        if size % 2 == 1:
            np.testing.assert_array_equal(ours_d, ref_d)
            np.testing.assert_array_equal(ours_e, ref_e)
        else:
            # even windows: same count of set pixels under half-pixel shift
            assert abs(int(ours_d.sum()) - int(ref_d.sum())) <= m.shape[0] + m.shape[1]


def test_open_close_identities(rng):
    m = _rand_mask(rng)
    opened = np.asarray(morph.opening(jnp.asarray(m), 3))
    closed = np.asarray(morph.closing(jnp.asarray(m), 3))
    ref_o = ndi.binary_opening(m, structure=np.ones((3, 3), bool)).astype(np.uint8)
    ref_c = ndi.binary_closing(m, structure=np.ones((3, 3), bool)).astype(np.uint8)
    np.testing.assert_array_equal(opened, ref_o)
    # scipy binary_closing pads border with 0 for the erosion step; interior matches
    np.testing.assert_array_equal(closed[2:-2, 2:-2], ref_c[2:-2, 2:-2])


def test_fill_holes_matches_scipy(rng):
    m = np.zeros((40, 40), np.uint8)
    m[5:30, 5:30] = 1
    m[10:20, 10:20] = 0  # hole
    m[32:38, 2:6] = 1    # solid blob
    ours = np.asarray(morph.fill_holes(jnp.asarray(m)))
    ref = ndi.binary_fill_holes(m).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)

    r = _rand_mask(rng, (32, 32), 0.4)
    np.testing.assert_array_equal(
        np.asarray(morph.fill_holes(jnp.asarray(r))),
        ndi.binary_fill_holes(r).astype(np.uint8))


def test_bwperim_4conn():
    m = np.zeros((16, 16), np.uint8)
    m[4:12, 4:12] = 1
    p = np.asarray(morph.bwperim(jnp.asarray(m)))
    # perimeter = mask minus 4-connected interior
    interior = ndi.binary_erosion(
        m, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool),
        border_value=0)
    ref = (m.astype(bool) & ~interior).astype(np.uint8)
    np.testing.assert_array_equal(p, ref)
    # edge-touching foreground counts as perimeter
    m2 = np.ones((8, 8), np.uint8)
    p2 = np.asarray(morph.bwperim(jnp.asarray(m2)))
    assert p2[0].all() and p2[-1].all() and p2[:, 0].all() and p2[:, -1].all()
    assert not p2[2:-2, 2:-2].any()
