"""Device mesh + sharding helpers.

The reference has no distributed anything (SURVEY.md section 2 audit); this
is the green-field multi-chip design: data parallelism over a batch of audio
clips/channels and sequence parallelism over the frame axis (halo exchange in
flan_tpu.parallel.stft_sp).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def seq_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the trailing (frame/time) axis of [C, N] audio."""
    return NamedSharding(mesh, P(None, axis_name))
