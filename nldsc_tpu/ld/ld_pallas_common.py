"""Shared layout constants + metadata packing for the int8 Pallas kernels.

TPU block-shape rules require the last two block dims to be (8k, 128k),
so per-SNP metadata rides in ONE int32 array of shape (n_blocks, 8, B)
(rows: lo, hi, usable, dom_ok, poison) and the six outputs ride in ONE
f32 array of the same shape (rows: l2, l2d, ws, wsd, wse, poison-count —
integer counters are exact in f32 below 2^24).

Split out of the retired f32 kernel module (r4); the full-band int8
kernel was retired in r5 (measured slower than the XLA full-band path
it duplicated, no annot epilogue) — ``ld_pallas_sym.py`` is the ONE
kept Pallas reference kernel and the sole consumer of these layouts.
"""

from __future__ import annotations

import jax.numpy as jnp

# metadata field rows
_LO, _HI, _USABLE, _DOM_OK, _POISON = range(5)
# output field rows
_L2, _L2D, _WS, _WSD, _WSE, _POI = range(6)


def pack_metadata(lo, hi, usable, dom_ok, add_sd_zero, nb: int, B: int):
    """Stack per-SNP metadata into the (nb, 8, B) int32 kernel layout."""
    zeros = jnp.zeros_like(lo)
    fields = [lo, hi, usable.astype(jnp.int32), dom_ok.astype(jnp.int32),
              add_sd_zero.astype(jnp.int32), zeros, zeros, zeros]
    return jnp.stack([f.reshape(nb, B) for f in fields], axis=1)


def pack_scalars(scal, nb: int, B: int):
    """(M, 9) scalar matrix -> (nb, 16, B) sublane-aligned packing."""
    rows = [scal[:, i].reshape(nb, B) for i in range(scal.shape[1])]
    zeros = jnp.zeros((nb, B), scal.dtype)
    rows += [zeros] * (16 - len(rows))
    return jnp.stack(rows, axis=1)
