"""Checkpoint / resume — implemented for real.

The reference declares ``run!(pickup=...)`` but it is a no-op stub
(src/Simulations/run.jl:32-36).  Here a checkpoint is the full ModelState
pytree (Eulerian state + particle SoA + clock + metrics) written as a
compressed ``.npz`` with the pytree structure recorded alongside, so a
simulation resumes bit-exactly on any backend.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import numpy as np

from ..models.state import (ModelState1D, ModelState2D, Particles1D,
                            Particles2D, StepMetrics)

_FORMAT_VERSION = 2  # v2: Particles2D stores 5 component planes, not z


def save_checkpoint(path: str, ms) -> str:
    """Serialize a ModelState pytree to ``path`` (.npz appended if absent)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    leaves, treedef = jax.tree.flatten(ms)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x))
              for i, x in enumerate(leaves)}
    kind = type(ms).__name__
    meta = json.dumps(dict(version=_FORMAT_VERSION, kind=kind,
                           n_leaves=len(leaves)))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __meta__=np.bytes_(meta), **arrays)
    return path


def load_checkpoint(path: str):
    """Restore a ModelState pytree from ``path``."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as f:
        meta = json.loads(bytes(f["__meta__"].item()).decode())
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unknown checkpoint version {meta['version']}")
        leaves = [f[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    kind = meta["kind"]
    if kind == "ModelState2D":
        template = ModelState2D(
            state=None,
            particles=Particles2D(lne=None, cgx=None, cgy=None, px=None,
                                  py=None, t=None, dt=None, on=None),
            time=None, iteration=None, metrics=StepMetrics.zeros())
    elif kind == "ModelState1D":
        template = ModelState1D(
            state=None,
            particles=Particles1D(z=None, t=None, dt=None, on=None),
            time=None, iteration=None, metrics=StepMetrics.zeros())
    else:
        raise ValueError(f"unknown checkpoint kind {kind}")
    treedef = jax.tree.structure(template,
                                 is_leaf=lambda x: x is None or hasattr(x, "shape"))
    import jax.numpy as jnp
    return jax.tree.unflatten(treedef, [jnp.asarray(x) for x in leaves])
