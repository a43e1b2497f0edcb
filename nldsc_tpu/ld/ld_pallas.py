"""Fused Pallas TPU kernel for banded LD scores.

One kernel fuses, per (pivot-block, neighbor-block) tile pair:

  * the two (B × N) @ (N × B) correlation matmuls (additive×additive and
    additive×dominance-residual), N-chunked with f32 VMEM accumulators;
  * the adjusted-r² epilogue ``1 - (1-r²)(n-1)/(n-2)``;
  * window/usability/self/threshold masks (pure integer-range tests — the
    exact window geometry is precomputed on host, windows.py);
  * row-sum accumulation of L2 / L2D and the three window counters.

Versus the XLA path (``ld_xla.py``) this avoids materializing any (B × B)
correlation tile in HBM: tiles live only in VMEM scratch.  The band is
walked via scalar-prefetched per-block bounds (``blk_lo``/``blk_hi``), so
the same compiled kernel serves any window geometry.

TPU block-shape rules require the last two block dims to be (8k, 128k), so
per-SNP metadata rides in ONE int32 array of shape (n_blocks, 8, B)
(rows: lo, hi, usable, dom_ok, poison) and the six outputs ride in ONE f32
array of the same shape (rows: l2, l2d, ws, wsd, wse, poison-count —
integer counters are exact in f32 below 2^24).

Grid: ``(n_blocks, band_k, n_chunks)`` — pivot blocks parallel, band and
sample-chunk dims sequential (accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ld_xla import finalize_outputs

# metadata field rows
_LO, _HI, _USABLE, _DOM_OK, _POISON = range(5)
# output field rows
_L2, _L2D, _WS, _WSD, _WSE, _POI = range(6)


def _kernel(blk_lo_ref, blk_hi_ref,          # scalar prefetch (SMEM)
            ya_ref, za_ref, zr_ref,          # genotype tiles (B, Nc)
            meta_i_ref, meta_j_ref,          # metadata (1, 8, B) int32
            out_ref,                         # outputs (1, 8, B) f32
            acc_add, acc_dom,                # VMEM scratch (B, B)
            *, n_samples: int, rsq_thr: float, block_size: int,
            precision: str):
    b = pl.program_id(0)
    k = pl.program_id(1)
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    B = block_size

    @pl.when((k == 0) & (c == 0))
    def _init_outputs():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(c == 0)
    def _init_scratch():
        acc_add[...] = jnp.zeros_like(acc_add)
        acc_dom[...] = jnp.zeros_like(acc_dom)

    dims = (((1,), (1,)), ((), ()))  # contract sample axes: ya @ za.T
    acc_add[...] += lax.dot_general(
        ya_ref[...], za_ref[...], dims,
        preferred_element_type=jnp.float32, precision=precision)
    acc_dom[...] += lax.dot_general(
        ya_ref[...], zr_ref[...], dims,
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(c == n_chunks - 1)
    def _epilogue():
        n = jnp.float32(n_samples)
        adj_c = (n - 1.0) / (n - 2.0)
        r_add = acc_add[...] / n
        adj_add = 1.0 - (1.0 - r_add * r_add) * adj_c
        r_dom = acc_dom[...] / n
        adj_dom = 1.0 - (1.0 - r_dom * r_dom) * adj_c

        jblk = jnp.minimum(blk_lo_ref[b] + k, pl.num_programs(0) - 1)
        valid_k = k <= blk_hi_ref[b] - blk_lo_ref[b]

        iota_r = lax.broadcasted_iota(jnp.int32, (B, B), 0)
        iota_c = lax.broadcasted_iota(jnp.int32, (B, B), 1)
        gi = b * B + iota_r
        gj = jblk * B + iota_c

        lo_i = meta_i_ref[0, _LO, :][:, None]
        hi_i = meta_i_ref[0, _HI, :][:, None]
        usable_i = meta_i_ref[0, _USABLE, :][:, None] > 0
        usable_j = meta_j_ref[0, _USABLE, :][None, :] > 0
        dom_ok_j = meta_j_ref[0, _DOM_OK, :][None, :] > 0
        poison_j = meta_j_ref[0, _POISON, :][None, :] > 0

        in_win = (gj >= lo_i) & (gj <= hi_i) & valid_k
        pair = in_win & usable_j & usable_i
        base = pair & (gj != gi)
        dmask = base & dom_ok_j
        basef = base.astype(jnp.float32)
        dmaskf = dmask.astype(jnp.float32)

        out_ref[0, _L2, :] += jnp.sum(adj_add * basef, axis=1)
        out_ref[0, _L2D, :] += jnp.sum(adj_dom * dmaskf, axis=1)
        out_ref[0, _WS, :] += jnp.sum(basef, axis=1)
        out_ref[0, _WSD, :] += jnp.sum(dmaskf, axis=1)
        out_ref[0, _WSE, :] += jnp.sum(
            jnp.where(adj_dom > jnp.float32(rsq_thr), dmaskf, 0.0), axis=1)
        out_ref[0, _POI, :] += jnp.sum(
            (pair & poison_j).astype(jnp.float32), axis=1)


def pack_metadata(lo, hi, usable, dom_ok, add_sd_zero, nb: int, B: int):
    """Stack per-SNP metadata into the (nb, 8, B) int32 kernel layout."""
    zeros = jnp.zeros_like(lo)
    fields = [lo, hi, usable.astype(jnp.int32), dom_ok.astype(jnp.int32),
              add_sd_zero.astype(jnp.int32), zeros, zeros, zeros]
    return jnp.stack([f.reshape(nb, B) for f in fields], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("rsq_thr", "block_size", "band_k", "n_samples",
                     "sample_chunk", "interpret", "precision"))
def ld_scores_pallas(add, res, lo, hi, usable, dom_ok, add_sd_zero,
                     blk_lo, blk_hi, *, rsq_thr: float, block_size: int,
                     band_k: int, n_samples: int, sample_chunk: int = 1024,
                     interpret: bool = False, precision: str = "highest"):
    """Banded LD pass with the fused Pallas kernel.

    Same contract as :func:`nldsc_tpu.ld.ld_xla.ld_scores_xla`; see there
    for parameter docs.  ``rsq_thr`` is static (it is 1/n_snp, fixed per
    dataset) and baked into the kernel.
    """
    m_pad, n_pad = add.shape
    B = block_size
    nb = m_pad // B
    # sample chunk must tile N_pad exactly and stay lane-aligned: snap to
    # the largest multiple-of-128 divisor of n_pad not above sample_chunk
    nc = max(128, (min(sample_chunk, n_pad) // 128) * 128)
    while n_pad % nc != 0:
        nc -= 128
    n_chunks = n_pad // nc

    meta = pack_metadata(lo, hi, usable, dom_ok, add_sd_zero, nb, B)

    kern = functools.partial(_kernel, n_samples=n_samples,
                             rsq_thr=float(rsq_thr), block_size=B,
                             precision=precision)

    def pivot_map(b, k, c, blk_lo_ref, blk_hi_ref):
        return (b, c)

    def nbr_map(b, k, c, blk_lo_ref, blk_hi_ref):
        return (jnp.minimum(blk_lo_ref[b] + k, pl.num_programs(0) - 1), c)

    def meta_i_map(b, k, c, blk_lo_ref, blk_hi_ref):
        return (b, 0, 0)

    def meta_j_map(b, k, c, blk_lo_ref, blk_hi_ref):
        return (jnp.minimum(blk_lo_ref[b] + k, pl.num_programs(0) - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, band_k, n_chunks),
        in_specs=[
            pl.BlockSpec((B, nc), pivot_map),        # ya
            pl.BlockSpec((B, nc), nbr_map),          # za
            pl.BlockSpec((B, nc), nbr_map),          # zr
            pl.BlockSpec((1, 8, B), meta_i_map),     # pivot metadata
            pl.BlockSpec((1, 8, B), meta_j_map),     # neighbor metadata
        ],
        out_specs=pl.BlockSpec((1, 8, B), meta_i_map),
        scratch_shapes=[
            pltpu.VMEM((B, B), jnp.float32),
            pltpu.VMEM((B, B), jnp.float32),
        ],
    )

    flops = 4 * m_pad * band_k * B * n_pad
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=3 * m_pad * n_pad * 4,
            transcendentals=0),
        interpret=interpret,
    )(blk_lo, blk_hi, add, add, res, meta, meta)

    fields = out.transpose(1, 0, 2).reshape(8, m_pad)
    l2_acc, l2d_acc = fields[_L2], fields[_L2D]
    ws, wsd, wse, poison = (fields[i].astype(jnp.int32)
                            for i in (_WS, _WSD, _WSE, _POI))
    return finalize_outputs(l2_acc, l2d_acc, ws, wsd, wse, poison,
                            usable, add_sd_zero)
