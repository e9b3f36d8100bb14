from .camera import Camera, camera_rays  # noqa: F401
from .integrator import closest_hit, color_at, is_shadowed  # noqa: F401
from .renderer import render  # noqa: F401
