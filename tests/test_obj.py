"""OBJ parser conformance tests (reference: src/obj_file.rs:131-336, 8 tests)."""

import os
import textwrap

import numpy as np
import pytest

from rtc_tpu.io.obj import Parser

from conftest import assert_almost_eq

FIXTURE = os.path.join(os.path.dirname(__file__), "files", "triangles.obj")


def test_ignoring_unrecognized_lines():
    gibberish = textwrap.dedent(
        """
        There was a young lady named Bright
        who traveled much faster than light.
        She set out one day
        in a relative way,
        and came back the previous night.
        """
    )
    parser = Parser.from_obj_str(gibberish)
    assert parser.ignored_lines == 5


def test_vertex_records():
    parser = Parser.from_obj_str(
        "\nv -1 1 0\nv -1.0000 0.5000 0.0000\nv 1 0 0\nv 1 1 0\n"
    )
    assert_almost_eq(parser.vertices(1), [-1, 1, 0])
    assert_almost_eq(parser.vertices(2), [-1.0, 0.5, 0.0])
    assert_almost_eq(parser.vertices(3), [1, 0, 0])
    assert_almost_eq(parser.vertices(4), [1, 1, 0])


def test_parsing_triangle_faces():
    parser = Parser.from_obj_str(
        "\nv -1 1 0\nv -1 0 0\nv 1 0 0\nv 1 1 0\n\nf 1 2 3\nf 1 3 4\n"
    )
    m = parser.group_mesh(None)
    assert m.v1.shape == (2, 3)
    assert_almost_eq(m.v1[0], parser.vertices(1))
    assert_almost_eq(m.v2[0], parser.vertices(2))
    assert_almost_eq(m.v3[0], parser.vertices(3))
    assert_almost_eq(m.v1[1], parser.vertices(1))
    assert_almost_eq(m.v2[1], parser.vertices(3))
    assert_almost_eq(m.v3[1], parser.vertices(4))


def test_triangulating_polygons():
    parser = Parser.from_obj_str(
        "\nv -1 1 0\nv -1 0 0\nv 1 0 0\nv 1 1 0\nv 0 2 0\n\nf 1 2 3 4 5\n"
    )
    m = parser.group_mesh(None)
    assert m.v1.shape == (3, 3)
    expected = [(1, 2, 3), (1, 3, 4), (1, 4, 5)]
    for i, (a, b, c) in enumerate(expected):
        assert_almost_eq(m.v1[i], parser.vertices(a))
        assert_almost_eq(m.v2[i], parser.vertices(b))
        assert_almost_eq(m.v3[i], parser.vertices(c))


def test_triangles_in_groups():
    parser = Parser.from_obj_file(FIXTURE)
    g1 = parser.group_mesh("FirstGroup")
    g2 = parser.group_mesh("SecondGroup")
    assert_almost_eq(g1.v1[0], parser.vertices(1))
    assert_almost_eq(g1.v2[0], parser.vertices(2))
    assert_almost_eq(g1.v3[0], parser.vertices(3))
    assert_almost_eq(g2.v1[0], parser.vertices(1))
    assert_almost_eq(g2.v2[0], parser.vertices(3))
    assert_almost_eq(g2.v3[0], parser.vertices(4))


def test_converting_an_obj_file_to_a_group():
    parser = Parser.from_obj_file(FIXTURE)
    g = parser.obj_to_group()
    assert len(g.children) == 3  # default + FirstGroup + SecondGroup
    assert g.children[0].v1.shape == (0, 3)  # default group is empty
    assert g.children[1].v1.shape == (1, 3)
    assert g.children[2].v1.shape == (1, 3)


def test_face_index_forms_with_slashes_are_rejected():
    # the reference panics on `v/vt/vn` indices (usize parse,
    # src/obj_file.rs:58-76); commented-out book tests confirm normals are
    # unsupported (src/obj_file.rs:295-335)
    with pytest.raises(ValueError):
        Parser.from_obj_str("v 0 1 0\nv -1 0 0\nv 1 0 0\nf 1//3 2//1 3//2\n")


def test_shipped_assets_parse():
    assets = os.path.join(os.path.dirname(__file__), "..", "assets")
    cow = Parser.from_obj_file(os.path.join(assets, "cow-nonormals.obj"))
    total = len(cow.default_faces) + sum(len(v) for v in cow.named_faces.values())
    assert len(cow.vertices_list) == 4583
    assert total == 5804
    teapot = Parser.from_obj_file(os.path.join(assets, "teapot.obj"))
    total = len(teapot.default_faces) + sum(len(v) for v in teapot.named_faces.values())
    assert total == 6320
