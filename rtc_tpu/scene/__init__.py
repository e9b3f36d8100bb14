from .compile import Scene, SceneStatic, compile_scene  # noqa: F401
from .materials import Material, Pattern  # noqa: F401
from .shapes import Shape  # noqa: F401
from .world import PointLight, World, default_world  # noqa: F401
