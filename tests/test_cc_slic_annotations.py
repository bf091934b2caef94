import numpy as np
import jax.numpy as jnp
import pytest
import scipy.ndimage as ndi

from wsiseg_tpu.ops import cc, slic
from wsiseg_tpu.data import annotations as ann
from wsiseg_tpu.slides import ArraySlide


# ---- connected components ----

def test_cc_host_matches_scipy(rng):
    mask = (rng.rand(64, 64) < 0.4).astype(np.uint8)
    labels, num = cc.connected_components(mask)
    ref, n_ref = ndi.label(mask, structure=np.ones((3, 3), bool))
    assert num == n_ref + 1
    # same partition (bijective relabeling)
    for k in range(1, n_ref + 1):
        vals = np.unique(labels[ref == k])
        assert len(vals) == 1 and vals[0] != 0


def test_cc_stats_layout():
    mask = np.zeros((32, 32), np.uint8)
    mask[4:10, 6:16] = 1
    st = cc.connected_components_with_stats(mask)
    assert st.num == 2
    x, y, w, h, area = st.stats[1]
    assert (x, y, w, h, area) == (6, 4, 10, 6, 60)
    np.testing.assert_allclose(st.centroids[1], [10.5, 6.5])


def test_label_propagation_matches_host():
    mask = np.zeros((48, 48), np.uint8)
    mask[2:10, 2:10] = 1
    mask[20:30, 20:35] = 1
    mask[40:44, 5:9] = 1
    dev = np.asarray(cc.label_propagation(jnp.asarray(mask)))
    host, n = cc.connected_components(mask, connectivity=4)
    assert len(np.unique(dev)) == len(np.unique(host)) == 4  # bg + 3
    for k in np.unique(host)[1:]:
        vals = np.unique(dev[host == k])
        assert len(vals) == 1 and vals[0] != 0


# ---- SLIC ----

def test_slic_segments_colored_quadrants(rng):
    img = np.zeros((64, 64, 3), np.uint8)
    img[:32, :32] = [200, 40, 40]
    img[:32, 32:] = [40, 200, 40]
    img[32:, :32] = [40, 40, 200]
    img[32:, 32:] = [200, 200, 40]
    labels = np.asarray(slic.slic(img, n_segments=16, compactness=10.0,
                                  sigma=0.0, iters=10))
    assert labels.shape == (64, 64)
    n_labels = len(np.unique(labels))
    assert 4 <= n_labels <= 36
    # quadrant boundaries must be respected: no superpixel spans two colors
    for k in np.unique(labels):
        sel = labels == k
        cols = img[sel].reshape(-1, 3)
        assert (cols == cols[0]).all(), f"superpixel {k} spans color edge"


def test_slic_locality(rng):
    img = (rng.rand(80, 80, 3) * 40 + 100).astype(np.uint8)
    labels = np.asarray(slic.slic(img, n_segments=25, sigma=0.0, iters=5))
    # every superpixel stays within a bounded window (2S locality)
    s = int(np.sqrt(80 * 80 / 25))
    for k in np.unique(labels):
        ys, xs = np.nonzero(labels == k)
        assert ys.max() - ys.min() <= 4 * s
        assert xs.max() - xs.min() <= 4 * s


def test_mark_boundaries():
    labels = np.zeros((8, 8), np.int32)
    labels[:, 4:] = 1
    img = np.zeros((8, 8, 3), np.uint8)
    out = slic.mark_boundaries(img, labels)
    assert (out[:, 3] == [255, 255, 0]).all()
    assert (out[:, 6] == 0).all()


# ---- annotations ----

APERIO_XML = """<?xml version="1.0"?>
<Annotations MicronsPerPixel="0.25">
 <Annotation>
  <Dummy/>
  <Regions>
   <Region AreaMicrons="100.0" LengthMicrons="40.0" Text="benign">
    <Attributes><Attribute Value="benign"/></Attributes>
    <Vertices>
     <Vertex X="10" Y="10"/><Vertex X="120" Y="10"/>
     <Vertex X="120" Y="100"/><Vertex X="10" Y="100"/>
    </Vertices>
   </Region>
   <Region AreaMicrons="50.0" LengthMicrons="30.0" Text="invasive carcinoma">
    <Attributes><Attribute Value="invasive carcinoma"/></Attributes>
    <Vertices>
     <Vertex X="200" Y="150"/><Vertex X="380" Y="150"/>
     <Vertex X="380" Y="250"/><Vertex X="200" Y="250"/>
    </Vertices>
   </Region>
  </Regions>
 </Annotation>
</Annotations>
"""


def test_read_aperio_xml(tmp_path):
    pth = tmp_path / "a.xml"
    pth.write_text(APERIO_XML)
    coords, labels, lengths, areas, mpp = ann.read_aperio_xml(str(pth))
    assert labels == [1, 3]
    assert mpp == 0.25
    assert coords[0].shape == (4, 2)
    assert areas == [100.0, 50.0]


def test_get_gt_aperio_rasterizes_at_level(tmp_path):
    pth = tmp_path / "a.xml"
    pth.write_text(APERIO_XML)
    slide = ArraySlide(np.zeros((512, 512, 3), np.uint8), num_levels=2)
    gt0 = ann.get_gt_aperio(str(pth), slide, level=0)
    assert gt0.shape == (512, 512)
    assert gt0[50, 60] == 1      # inside benign box
    assert gt0[200, 300] == 3    # inside invasive box
    assert gt0[400, 400] == 0
    gt1 = ann.get_gt_aperio(str(pth), slide, level=1)
    assert gt1.shape == (128, 128)
    assert gt1[50, 70] == 3      # 200..250/4, 200..380/4


def test_get_tb_aperio(tmp_path):
    pth = tmp_path / "a.xml"
    pth.write_text(APERIO_XML)
    slide = ArraySlide(np.zeros((512, 512, 3), np.uint8), num_levels=2)
    gt = ann.get_gt_aperio(str(pth), slide, level=0)
    tb = ann.get_tb_aperio(gt.copy().astype(np.int32), slide, level=0)
    assert tb.shape[:2] == (512, 512)
    assert tb[200, 300] > 0      # malignant inside hull
    assert tb[50, 60] == 0       # benign excluded


SEDEEN_XML = """<?xml version="1.0"?>
<session>
 <image>
  <a/><b/><c/>
  <overlays>
   <graphic type="polygon" description="DCIS region">
    <pen/><font/>
    <point-list>
     <point>50,50</point><point>300,50</point>
     <point>300,300</point><point>50,300</point>
    </point-list>
   </graphic>
   <graphic type="polygon" description="TB outline">
    <pen/><font/>
    <point-list>
     <point>20,20</point><point>400,20</point>
     <point>400,400</point><point>20,400</point>
    </point-list>
   </graphic>
   <graphic type="text" description="invasive">
    <pen/><font/>
    <point-list><point>1,1</point></point-list>
   </graphic>
  </overlays>
 </image>
</session>
"""


def test_sedeen_class_mapping():
    assert ann.sedeen_class("DCIS present") == 2
    assert ann.sedeen_class("no dcis") == 0
    assert ann.sedeen_class("IDC") == 3
    assert ann.sedeen_class("benign tissue") == 1
    assert ann.sedeen_class("cellularity 30%") == 0
    assert ann.sedeen_class("tumor bed tb") == 0


def test_get_gt_sedeen(tmp_path):
    pth = tmp_path / "s.session.xml"
    pth.write_text(SEDEEN_XML)
    slide = ArraySlide(np.zeros((512, 512, 3), np.uint8), num_levels=2)
    gt = ann.get_gt_sedeen(str(pth), slide, level=0)
    assert gt.shape == (512, 512)
    assert gt[150, 150] == 2      # filled DCIS polygon interior
    assert gt[480, 480] == 0
    # text graphic skipped, tb label skipped in non-TB reader
    tb = ann.get_tb_sedeen(str(pth), slide, level=0)
    assert tb[200, 200] > 0       # inside TB outline (filled)
    assert tb[10, 10] == 0
