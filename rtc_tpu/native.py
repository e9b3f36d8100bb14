"""ctypes bindings to the C++ host runtime (native/rtc_native.cpp).

Everything here has a pure-Python fallback; `available()` reports whether the
shared library was found (it is built with `make -C native`). The split
mirrors the reference's all-native runtime: XLA/Pallas owns device compute,
C++ owns the host-side hot paths (OBJ ingest, PPM encode, Morton ordering).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native", "librtc_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        # best-effort build; stay silent on failure (fallbacks cover us)
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(path)],
                capture_output=True, timeout=120, check=False,
            )
        except Exception:
            pass
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    lib.obj_parse.restype = ctypes.c_void_p
    lib.obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.obj_last_error.restype = ctypes.c_char_p
    for name in ("obj_num_vertices", "obj_num_faces", "obj_num_groups",
                 "obj_ignored_lines"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    lib.obj_copy_vertices.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.obj_copy_faces.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.obj_copy_face_groups.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.obj_group_name.restype = ctypes.c_int64
    lib.obj_group_name.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_char_p, ctypes.c_int64]
    lib.obj_free.argtypes = [ctypes.c_void_p]
    lib.ppm_encode.restype = ctypes.c_int64
    lib.ppm_encode.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    lib.morton_order.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_obj(text: str):
    """Returns (vertices (V,3) f64, faces (F,3) i64 0-based, face_group (F,) i64,
    group_names list, ignored_lines) or None if native lib unavailable.
    Raises ValueError on malformed input (matching the Python parser)."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    handle = lib.obj_parse(raw, len(raw))
    if not handle:
        raise ValueError(lib.obj_last_error().decode())
    try:
        nv = lib.obj_num_vertices(handle)
        nf = lib.obj_num_faces(handle)
        ng = lib.obj_num_groups(handle)
        verts = np.empty((nv, 3), dtype=np.float64)
        faces = np.empty((nf, 3), dtype=np.int64)
        fgroups = np.empty((nf,), dtype=np.int64)
        if nv:
            lib.obj_copy_vertices(handle, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if nf:
            lib.obj_copy_faces(handle, faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            lib.obj_copy_face_groups(handle, fgroups.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        names = []
        buf = ctypes.create_string_buffer(256)
        for i in range(ng):
            lib.obj_group_name(handle, i, buf, 256)
            names.append(buf.value.decode())
        ignored = lib.obj_ignored_lines(handle)
        return verts, faces, fgroups, names, int(ignored)
    finally:
        lib.obj_free(handle)


def encode_ppm(pixels: np.ndarray) -> Optional[bytes]:
    """P3 PPM bytes for an (H, W, 3) float image, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pixels = np.ascontiguousarray(pixels, dtype=np.float64)
    h, w = pixels.shape[0], pixels.shape[1]
    ptr = pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    size = lib.ppm_encode(ptr, w, h, None, 0)
    out = ctypes.create_string_buffer(size)
    lib.ppm_encode(ptr, w, h, out, size)
    return out.raw[:size]


def morton_order(centroids: np.ndarray) -> Optional[np.ndarray]:
    """Morton sort order for (N, 3) centroids, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    centroids = np.ascontiguousarray(centroids, dtype=np.float64)
    n = len(centroids)
    order = np.empty((n,), dtype=np.int64)
    lib.morton_order(
        centroids.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return order
