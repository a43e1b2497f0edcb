"""Fused Pallas kernel on the integer-exact algebra.

Combines the two fastest ideas in one kernel:

* contractions as bf16×bf16→f32 MXU matmuls over integer genotype codes —
  bit-exact (codes ∈ {0,1,2}, partial sums integer < 2²⁴) at single-pass
  MXU rate (``ld_int8.py`` module docstring has the algebra);
* the centering corrections, the cancellation-free class-decomposed
  dominance epilogue (:func:`nldsc_tpu.ld.ld_int8.corr_from_dots`),
  adjusted-r², window masks, and row-sum accumulation fused in VMEM — no
  (B×B) correlation tile ever reaches HBM.

Layouts follow ``ld_pallas.py``: scalar-prefetched band bounds, packed
(nb, 8, B) int32 window/usability metadata, packed (nb, 16, B) f32 per-SNP
scalars (``SCAL_FIELDS``), packed (nb, 8, B) f32 outputs.
Grid ``(n_blocks, band_k, n_chunks)``.

The no-missing variant accumulates 2 integer matmuls per tile (Sgg, Sgh);
the missing variant 6 (+Sgm, Smg, Smm, Smh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ld_pallas_common import (_L2, _L2D, _WS, _WSD, _WSE, _POI,
                               pack_metadata)
from .ld_xla import finalize_outputs
from .ld_int8 import SCAL_FIELDS, corr_from_dots

_LO, _HI, _USABLE, _DOM_OK, _POISON = range(5)


def _bdot(x, y):
    return lax.dot_general(
        x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _kernel(blk_lo_ref, blk_hi_ref,
            gi_ref, mi_ref, gj_ref, mj_ref, hj_ref,       # int8 tiles (B, Nc)
            meta_i_ref, meta_j_ref,                        # int32 (1, 8, B)
            scal_i_ref, scal_j_ref,                        # f32 (1, 16, B)
            out_ref,                                       # f32 (1, 8, B)
            *accs,                                         # VMEM scratch
            n_samples: int, n_pad_cols: int, rsq_thr: float,
            block_size: int, has_missing: bool):
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
        for a in accs:
            a[...] = jnp.zeros_like(a)

    if has_missing:
        acc_gg, acc_gh, acc_gm, acc_mg, acc_mm, acc_mh = accs
        acc_gm[...] += _bdot(gi_ref[...], mj_ref[...])
        acc_mg[...] += _bdot(mi_ref[...], gj_ref[...])
        acc_mm[...] += _bdot(mi_ref[...], mj_ref[...])
        acc_mh[...] += _bdot(mi_ref[...], hj_ref[...])
    else:
        acc_gg, acc_gh = accs
    acc_gg[...] += _bdot(gi_ref[...], gj_ref[...])
    acc_gh[...] += _bdot(gi_ref[...], hj_ref[...])

    @pl.when(c == n_chunks - 1)
    def _epilogue():
        n = jnp.float32(n_samples)
        n_padf = jnp.float32(n_pad_cols)
        adj_c = (n - 1.0) / (n - 2.0)

        sc_i = {f: scal_i_ref[0, i, :][:, None]
                for i, f in enumerate(SCAL_FIELDS)}
        sc_j = {f: scal_j_ref[0, i, :][None, :]
                for i, f in enumerate(SCAL_FIELDS)}
        dots = {"sgg": acc_gg[...], "sgh": acc_gh[...]}
        if has_missing:
            dots.update(sgm=acc_gm[...], smg=acc_mg[...],
                        smm=acc_mm[...], smh=acc_mh[...])
        r_add, r_dom = corr_from_dots(dots, sc_i, sc_j, n, n_padf,
                                      has_missing)
        adj_add = 1.0 - (1.0 - r_add * r_add) * adj_c
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


def pack_scalars(scal, nb: int, B: int):
    """(M, 9) scalar matrix -> (nb, 16, B) sublane-aligned packing."""
    rows = [scal[:, i].reshape(nb, B) for i in range(scal.shape[1])]
    zeros = jnp.zeros((nb, B), scal.dtype)
    rows += [zeros] * (16 - len(rows))
    return jnp.stack(rows, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("rsq_thr", "block_size", "band_k", "n_samples",
                     "sample_chunk", "interpret", "has_missing"))
def ld_scores_pallas_int8(g, m, h, scal, lo, hi, usable, dom_ok, add_sd_zero,
                          blk_lo, blk_hi, *,
                          rsq_thr: float, block_size: int, band_k: int,
                          n_samples: int, sample_chunk: int = 1024,
                          interpret: bool = False, has_missing: bool = True):
    """Same contract as :func:`nldsc_tpu.ld.ld_int8.ld_scores_int8`."""
    m_pad, n_pad = g.shape
    B = block_size
    nb = m_pad // B
    # sample chunk must tile N_pad exactly and stay lane-aligned: snap to
    # the largest multiple-of-128 divisor of n_pad not above sample_chunk
    nc = max(128, (min(sample_chunk, n_pad) // 128) * 128)
    while n_pad % nc != 0:
        nc -= 128
    n_chunks = n_pad // nc

    meta = pack_metadata(lo, hi, usable, dom_ok, add_sd_zero, nb, B)
    scal_p = pack_scalars(scal, nb, B)

    kern = functools.partial(
        _kernel, n_samples=n_samples, n_pad_cols=n_pad,
        rsq_thr=float(rsq_thr), block_size=B, has_missing=has_missing)

    def pivot_map(b, k, c, *_):
        return (b, c)

    def nbr_map(b, k, c, blk_lo_ref, blk_hi_ref):
        return (jnp.minimum(blk_lo_ref[b] + k, pl.num_programs(0) - 1), c)

    def meta_i_map(b, k, c, *_):
        return (b, 0, 0)

    def meta_j_map(b, k, c, blk_lo_ref, blk_hi_ref):
        return (jnp.minimum(blk_lo_ref[b] + k, pl.num_programs(0) - 1), 0, 0)

    n_acc = 6 if has_missing else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, band_k, n_chunks),
        in_specs=[
            pl.BlockSpec((B, nc), pivot_map),        # g pivot
            pl.BlockSpec((B, nc), pivot_map),        # m pivot
            pl.BlockSpec((B, nc), nbr_map),          # g neighbor
            pl.BlockSpec((B, nc), nbr_map),          # m neighbor
            pl.BlockSpec((B, nc), nbr_map),          # h neighbor
            pl.BlockSpec((1, 8, B), meta_i_map),
            pl.BlockSpec((1, 8, B), meta_j_map),
            pl.BlockSpec((1, 16, B), meta_i_map),    # scalars pivot
            pl.BlockSpec((1, 16, B), meta_j_map),    # scalars neighbor
        ],
        out_specs=pl.BlockSpec((1, 8, B), meta_i_map),
        scratch_shapes=[pltpu.VMEM((B, B), jnp.float32)] * n_acc,
    )

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_acc * m_pad * band_k * B * n_pad,
            bytes_accessed=5 * m_pad * n_pad, transcendentals=0),
        interpret=interpret,
    )(blk_lo, blk_hi, g, m, g, m, h, meta, meta, scal_p, scal_p)

    fields = out.transpose(1, 0, 2).reshape(8, m_pad)
    l2_acc, l2d_acc = fields[_L2], fields[_L2D]
    ws, wsd, wse, poison = (fields[i].astype(jnp.int32)
                            for i in (_WS, _WSD, _WSE, _POI))
    return finalize_outputs(l2_acc, l2d_acc, ws, wsd, wse, poison,
                            usable, add_sd_zero)
