"""Device-mesh helpers.

The LD workload shards the SNP axis over a 1-D mesh (SURVEY §2.2): every
device owns a contiguous SNP range, window-boundary halos ride the ICI ring
via ``ppermute``, and each output row is owned by exactly one device — so
the merge is a pure ``all_gather`` of disjoint rows, with no ``psum`` races.

Determinism contract (asserted in tests/test_sharded.py and the driver
dryrun): l2/l2d are BITWISE invariant in the device count — per-shard tile
geometry is count-independent (a pivot block's band always starts at the
block itself; the halo supplies out-of-range rows instead of shifting the
band), so every per-row reduction sees the same values at the same lane
positions on any mesh.  Versus the single-device dense engine, all integer
counters (including the value-dependent WSE — same exact-integer adjusted
r² feeding the compares) are exactly equal; the f32 l2/l2d sums may differ
by summation-order ulps at band-clamp boundaries (the dense engine shifts
tail bands left instead of halo-padding).
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
