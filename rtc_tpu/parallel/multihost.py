"""Multi-host rendering (SPMD across a pod slice).

The single-controller pattern: every host runs the same program,
`jax.distributed.initialize()` wires the slice together, rays shard across
the GLOBAL ('rays', 'prims') mesh (ICI within a host's chips, DCN across
hosts), and each host materializes only its addressable shard of the image.
Host 0 assembles the full canvas for output.

Untestable on a single-host dev box by construction; the logic below is the
standard jax.distributed recipe and the single-host path degrades to
parallel.shard.render_sharded.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..render.camera import Camera
from ..scene.compile import Scene
from ..utils.config import DEFAULT_CONFIG, RenderConfig
from .mesh import make_mesh
from .shard import render_sharded


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize passthrough (env-driven when args omitted)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def render_multihost(scene: Scene, camera: Camera,
                     cfg: RenderConfig = DEFAULT_CONFIG,
                     shard_prims: bool = False) -> Optional[np.ndarray]:
    """Render across all processes' devices. Returns the assembled (V, H, 3)
    image on process 0, None elsewhere."""
    mesh = make_mesh(devices=jax.devices())  # global mesh, all hosts
    image = render_sharded(scene, camera, cfg, mesh=mesh, shard_prims=shard_prims)
    # gather the fully-addressable array onto every host, return on host 0
    from jax.experimental import multihost_utils

    local = multihost_utils.process_allgather(image, tiled=True)
    if jax.process_index() == 0:
        return np.asarray(local)
    return None
