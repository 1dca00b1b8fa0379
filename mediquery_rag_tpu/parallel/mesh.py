"""Mesh helpers: one place to build `jax.sharding.Mesh`es.

Design per the scaling-book recipe: pick a mesh, annotate shardings with
NamedSharding, let XLA insert the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: dict[str, int], devices=None) -> Mesh:
    """Build a mesh with named axes, e.g. ``{"data": 4, "model": 2}``."""
    devices = jax.devices() if devices is None else devices
    sizes = list(shape.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(arr, tuple(shape.keys()))


def corpus_mesh(n_shards: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over which the corpus rows are sharded (DP-of-the-database)."""
    devices = jax.devices()
    n = len(devices) if n_shards is None else n_shards
    return make_mesh({axis: n}, devices)
