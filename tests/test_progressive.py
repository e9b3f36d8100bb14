"""Tile rendering + checkpoint/resume + bounds API."""

import os

import numpy as np

from rtc_tpu.models.scenes import REGISTRY
from rtc_tpu.ops import transforms as X
from rtc_tpu.render.progressive import render_with_checkpoints
from rtc_tpu.render.renderer import render
from rtc_tpu.scene import shapes as S
from rtc_tpu.scene.bounds import shape_bounds
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.utils.config import RenderConfig

from conftest import assert_almost_eq

CFG = RenderConfig(ray_tile=512, dtype="float32")


def test_progressive_matches_oneshot(tmp_path):
    world, cam = REGISTRY["three_spheres"](48)
    scene = compile_scene(world, dtype=np.float32)
    ref = np.asarray(render(scene, cam, CFG))
    img = render_with_checkpoints(scene, cam, CFG)
    diff = np.max(np.abs(img - ref), axis=-1)
    assert (diff > 1e-5).mean() < 0.01  # knife-edge pattern pixels only


def test_checkpoint_resume(tmp_path):
    world, cam = REGISTRY["three_spheres"](48)
    scene = compile_scene(world, dtype=np.float32)
    ck = str(tmp_path / "render.npz")

    # simulate a crash: render only the first tiles by monkeypatched interrupt
    from rtc_tpu.render import progressive

    tiles_done = []
    orig = progressive.render_tiles

    def crashing(scene, camera, cfg, start_tile=0):
        for i, total, colors in orig(scene, camera, cfg, start_tile):
            if i >= 2 and start_tile == 0:
                raise KeyboardInterrupt
            tiles_done.append(i)
            yield i, total, colors

    progressive.render_tiles = crashing
    try:
        try:
            render_with_checkpoints(scene, cam, CFG, checkpoint_path=ck,
                                    checkpoint_every=1)
        except KeyboardInterrupt:
            pass
        assert os.path.exists(ck)
        img = render_with_checkpoints(scene, cam, CFG, checkpoint_path=ck,
                                      checkpoint_every=1)
    finally:
        progressive.render_tiles = orig

    full = render_with_checkpoints(scene, cam, CFG)
    assert_almost_eq(img, full, eps=1e-6)
    # the resumed run skipped the tiles done before the crash
    assert 0 in tiles_done and min(
        t for t in tiles_done if t >= 2) >= 2


def test_shape_bounds_per_kind():
    lo, hi = shape_bounds(S.sphere())
    assert_almost_eq(lo, [-1, -1, -1])
    assert_almost_eq(hi, [1, 1, 1])
    lo, hi = shape_bounds(S.cylinder(1.0, 2.0, True))
    assert_almost_eq(lo, [-1, 1, -1])
    assert_almost_eq(hi, [1, 2, 1])
    lo, hi = shape_bounds(S.cone(-2.0, 3.0, True))
    assert_almost_eq(lo, [-3, -2, -3])
    assert_almost_eq(hi, [3, 3, 3])
    lo, hi = shape_bounds(S.triangle([0, 1, 0], [-1, 0, 0], [1, 0, 0]))
    assert_almost_eq(lo, [-1, 0, 0])
    assert_almost_eq(hi, [1, 1, 0])
    lo, hi = shape_bounds(S.plane())
    assert np.isinf(lo[0]) and lo[1] == 0 and np.isinf(hi[2])


def test_group_bounds_union_of_transformed_children():
    s1 = S.sphere()
    s1.set_transform(X.translation(5, 0, 0))
    s2 = S.sphere()
    s2.set_transform(X.scaling(2, 2, 2))
    g = S.group([s1, s2])
    lo, hi = shape_bounds(g)
    assert_almost_eq(lo, [-2, -2, -2])
    assert_almost_eq(hi, [6, 2, 2])
