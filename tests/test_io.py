"""Parser tests against the reference scene assets.

Expected numbers come from the reference's own printf output semantics
(scene.cpp:209-212) and direct inspection of the assets:
veach-mis.obj has 2,332 ``f`` records, staircase.obj 31,407 (SURVEY.md §0).
"""

import numpy as np
import pytest

from tests.conftest import SCENES
from tinyraytracing_tpu.io.image import tonemap_srgb
from tinyraytracing_tpu.io.mtl import parse_mtl
from tinyraytracing_tpu.io.objmesh import parse_obj, triangle_areas
from tinyraytracing_tpu.io.xmlscene import parse_scene_xml


def test_xml_test_scene():
    cfg = parse_scene_xml(f"{SCENES}/test/back.xml")
    assert (cfg.width, cfg.height) == (1024, 1024)
    assert cfg.fovy == pytest.approx(39.3077)
    assert cfg.eye == pytest.approx((278.0, 273.0, -800.0))
    assert cfg.lookat == pytest.approx((278.0, 273.0, -799.0))
    assert cfg.up == (0.0, 1.0, 0.0)
    assert len(cfg.lights) == 1
    assert cfg.lights[0].mtl_name == "back:Light"
    assert cfg.lights[0].radiance == pytest.approx((34.0, 24.0, 8.0))


def test_xml_multiline_radiance():
    # staircase.xml carries newlines inside radiance attributes
    cfg = parse_scene_xml(f"{SCENES}/staircase/staircase.xml")
    assert len(cfg.lights) == 6
    names = [l.mtl_name for l in cfg.lights]
    assert names[0] == "ceilingLight"  # light order is load-bearing (NEE quirk)
    left = dict(zip(names, [l.radiance for l in cfg.lights]))["leftLight"]
    assert left == pytest.approx((2.742004577636719, 2.1547576084136963, 0.9237708320617676))


def test_mtl_defaults_and_kt_quirk():
    mats = parse_mtl(f"{SCENES}/test/back.mtl")
    m = mats["back:DiffuseWhite"]
    assert m.kd == pytest.approx((0.79, 0.76, 0.73))
    # 'Kt' is NOT parsed by the reference (only 'Tr', scene.cpp:90-94):
    assert m.tr == (0.0, 0.0, 0.0)
    assert m.ns == 1.0 and m.ni == 1.0
    mats2 = parse_mtl(f"{SCENES}/test/back.mtl", kt_as_tr=True)
    assert mats2["back:DiffuseWhite"].tr == pytest.approx((1.0, 1.0, 1.0))


def test_obj_test_scene():
    mesh = parse_obj(f"{SCENES}/test/back.obj")
    assert mesh.num_triangles == 26
    # geometric normals are unit
    assert np.allclose(np.linalg.norm(mesh.normal, axis=1), 1.0, atol=1e-12)
    # two 130x105 light quads (4 triangles of area 6825 each)
    light_ids = [i for i, n in enumerate(mesh.mtl_names) if n == "back:Light"]
    sel = mesh.mtl == light_ids[0]
    assert sel.sum() == 4
    assert triangle_areas(mesh.v)[sel].sum() == pytest.approx(2 * 130 * 105.0, rel=1e-6)


def test_obj_counts_reference_assets():
    assert parse_obj(f"{SCENES}/veach-mis/veach-mis.obj").num_triangles == 2332


@pytest.mark.slow
def test_obj_staircase():
    mesh = parse_obj(f"{SCENES}/staircase/staircase.obj")
    assert mesh.num_triangles == 31407
    # staircase declares vn before vt -> isvnvt stays True there
    assert np.abs(mesh.vn).sum() > 0


def test_tonemap_matches_reference_cast():
    x = np.array([[[0.0, 0.5, 1.0]]])
    out = tonemap_srgb(x)
    # pow(0.5, 1/2.2)*255 = 186.51... -> truncates to 186
    assert out.tolist() == [[[0, 186, 255]]]
    assert tonemap_srgb(np.array([[[2.0, -1.0, 0.2178]]])).tolist() == [[[255, 0, 127]]]


def test_native_matches_python():
    """Native C++ OBJ parser and BVH builder must agree exactly with the
    Python implementations (skipped when no toolchain)."""
    pytest.importorskip("tinyraytracing_tpu.native")
    try:
        from tinyraytracing_tpu.native import build_bvh_native, parse_obj_native
        m1 = parse_obj_native(f"{SCENES}/veach-mis/veach-mis.obj")
    except ImportError:
        pytest.skip("native toolchain unavailable")
    m2 = parse_obj(f"{SCENES}/veach-mis/veach-mis.obj")
    assert m1.num_triangles == m2.num_triangles == 2332
    np.testing.assert_allclose(m1.v, m2.v)
    np.testing.assert_allclose(m1.vn, m2.vn)
    np.testing.assert_allclose(m1.vt, m2.vt)
    np.testing.assert_array_equal(m1.mtl, m2.mtl)
    assert m1.mtl_names == m2.mtl_names

    from tinyraytracing_tpu.ops.bvh import build_bvh

    n1, p1 = build_bvh_native(m1.v)
    n2, p2 = build_bvh(m2.v)
    np.testing.assert_array_equal(p1, p2)
    for k in ("start", "count", "skip"):
        np.testing.assert_array_equal(n1[k], n2[k])
    np.testing.assert_allclose(n1["nmin"], n2["nmin"], atol=1e-4)
