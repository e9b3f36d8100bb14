"""Parameter checkpointing for optimization loops (inverse rendering).

The reference persists nothing but the final PPM (SURVEY.md §5). Scene
parameters here are a flat dict-of-arrays pytree (diff.render_grad), so
standard orbax checkpointing applies directly; a NumPy .npz fallback keeps
the capability alive if orbax is unavailable.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save(path: str, params: Dict[str, Any], step: Optional[int] = None) -> str:
    """Persist a parameter pytree. Returns the path written."""
    path = os.path.abspath(path)
    ocp = _orbax()
    if ocp is not None:
        ckptr = ocp.PyTreeCheckpointer()
        target = os.path.join(path, f"step_{step}") if step is not None else path
        ckptr.save(target, params, force=True)
        return target
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {k: np.asarray(v) for k, v in params.items()}
    if step is not None:
        flat["__step__"] = np.asarray(step)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    return path if path.endswith(".npz") else path + ".npz"


def restore(path: str) -> Dict[str, Any]:
    """Load a parameter pytree saved by `save`."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        ocp = _orbax()
        if ocp is None:
            raise RuntimeError("orbax checkpoint directory but orbax missing")
        return ocp.PyTreeCheckpointer().restore(path)
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path)
    return {k: data[k] for k in data.files if k != "__step__"}
