"""Device-mesh helpers.

The LD workload shards the SNP axis over a 1-D mesh (SURVEY §2.2): every
device owns a contiguous SNP range, window-boundary halos ride the ICI ring
via ``ppermute``, and each output row is owned by exactly one device — so
the merge is a pure ``all_gather`` of disjoint rows, no ``psum`` races and
bitwise-deterministic results regardless of device count.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


SNP_AXIS = "snp"


def snp_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the SNP axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (SNP_AXIS,))
