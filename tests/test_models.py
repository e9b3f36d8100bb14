"""Scene builders (reference: src/main.rs:84-397) compile and render."""

import numpy as np
import pytest

from rtc_tpu.models.scenes import REGISTRY
from rtc_tpu.render.renderer import render
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.utils.config import RenderConfig


@pytest.mark.parametrize("name", ["hexagon", "table", "single_sphere",
                                  "three_spheres", "glass_spheres"])
def test_scene_renders_nonempty(name):
    world, cam_factory_width = REGISTRY[name](64)
    world, cam = REGISTRY[name](64)
    scene = compile_scene(world, dtype=np.float32)
    img = np.asarray(render(scene, cam, RenderConfig(ray_tile=2048)))
    assert img.shape == (cam.vsize, cam.hsize, 3)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.01  # something is visible


@pytest.mark.parametrize("name", ["cow", "teapot"])
def test_mesh_scene_renders_nonempty(name):
    world, cam = REGISTRY[name](40)
    scene = compile_scene(world, dtype=np.float32)
    assert scene.static.n_tris > 5000
    img = np.asarray(render(scene, cam, RenderConfig(ray_tile=512)))
    assert np.all(np.isfinite(img))
    assert img.max() > 0.01


def test_cow_scene_structure():
    world, _ = REGISTRY["cow"](40)
    scene = compile_scene(world, dtype=np.float32)
    # 5804 real triangles padded up to a whole number of clusters
    assert scene.static.n_tris >= 5804
    assert scene.static.n_tris == scene.static.n_clusters * scene.static.cluster_size
    assert scene.static.any_reflective  # cow material reflective=0.2
