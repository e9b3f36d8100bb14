"""C++ host runtime vs Python fallbacks (native/rtc_native.cpp)."""

import numpy as np
import pytest

from rtc_tpu import native
from rtc_tpu.io.canvas import Canvas
from rtc_tpu.io.obj import Parser

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_native_obj_matches_python_on_cow():
    import os

    text = open(os.path.join(os.path.dirname(__file__), "..", "assets",
                             "cow-nonormals.obj")).read()
    p_native = Parser.from_obj_str(text)       # native fast path
    p_py = Parser._from_obj_str_py(text)       # pure python
    assert len(p_native.vertices_list) == len(p_py.vertices_list)
    assert p_native.default_faces == p_py.default_faces
    assert p_native.named_faces == p_py.named_faces
    assert p_native.ignored_lines == p_py.ignored_lines
    np.testing.assert_allclose(
        np.stack(p_native.vertices_list), np.stack(p_py.vertices_list))


def test_native_obj_groups_and_triangulation():
    text = "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0 0 1\ng A\nf 1 2 3 4\ng B\nf 1 2 5\nnope\n"
    pn = Parser.from_obj_str(text)
    pp = Parser._from_obj_str_py(text)
    assert pn.named_faces == pp.named_faces
    assert pn.ignored_lines == pp.ignored_lines == 1
    assert pn.group_names() == pp.group_names()


def test_native_obj_rejects_slash_faces():
    with pytest.raises(ValueError):
        Parser.from_obj_str("v 0 1 0\nv -1 0 0\nv 1 0 0\nf 1//3 2//1 3//2\n")


def test_native_ppm_byte_identical():
    rng = np.random.default_rng(7)
    img = rng.uniform(-0.2, 1.3, size=(31, 57, 3))
    c = Canvas.from_image(img)
    assert native.encode_ppm(img).decode() == c.to_ppm_string()


def test_native_morton_matches_numpy():
    from rtc_tpu.scene.compile import _spread_bits

    rng = np.random.default_rng(3)
    cen = rng.normal(size=(500, 3))
    lo = cen.min(axis=0)
    ext = np.where(cen.max(axis=0) - lo > 0, cen.max(axis=0) - lo, 1.0)
    q = np.clip((cen - lo) / ext * 1023.0, 0, 1023).astype(np.uint64)
    code = (_spread_bits(q[:, 0]) | (_spread_bits(q[:, 1]) << np.uint64(1))
            | (_spread_bits(q[:, 2]) << np.uint64(2)))
    np.testing.assert_array_equal(
        native.morton_order(cen), np.argsort(code, kind="stable"))
