"""Ray ordering: Morton (Z-order) pixel traversal.

The reference walks pixels in scanline order (src/camera.rs:70-71). The
wavefront kernels process rays in fixed-size tiles, and a tile's cost is
driven by how many acceleration-structure nodes its rays collectively
overlap — a 128-pixel scanline run spans 128 px horizontally, while the same
128 rays in Z-order form a compact ~16x8 screen block with a much smaller
footprint (measured: ~25% fewer scheduled clusters per tile on the cow
scene, and tighter direction cones for the interval cull). Ordering is pure
permutation: every per-ray computation is elementwise, so rendering in
Morton order and inverse-permuting the colors is exact.
"""

from __future__ import annotations

import functools

import numpy as np


def _spread2(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v so they occupy even bit positions."""
    v = v.astype(np.uint64)
    v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << 2)) & np.uint64(0x3333333333333333)
    v = (v | (v << 1)) & np.uint64(0x5555555555555555)
    return v


@functools.lru_cache(maxsize=16)
def morton_perm(vsize: int, hsize: int):
    """(perm, inv_perm) int32 arrays: ray index -> Morton rank and back.

    perm lists flat pixel indices in Z-order; colors rendered in that order
    are restored with colors[inv_perm].
    """
    yy, xx = np.meshgrid(
        np.arange(vsize, dtype=np.uint64),
        np.arange(hsize, dtype=np.uint64),
        indexing="ij",
    )
    code = _spread2(xx.ravel()) | (_spread2(yy.ravel()) << np.uint64(1))
    perm = np.argsort(code, kind="stable").astype(np.int32)
    inv = np.argsort(perm, kind="stable").astype(np.int32)
    return perm, inv
