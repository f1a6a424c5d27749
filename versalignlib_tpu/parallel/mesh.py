"""Device mesh construction for data-parallel alignment."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

#: Name of the batch-sharding mesh axis.
DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    Pairwise alignment has no inter-pair coupling, so a single ``data`` axis
    is the natural (and bandwidth-optimal) layout: the only collective in the
    pipeline is the result all-gather. Multi-axis meshes (e.g. hosts x chips)
    collapse to the same thing for this workload.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices).reshape(-1), (DATA_AXIS,))
