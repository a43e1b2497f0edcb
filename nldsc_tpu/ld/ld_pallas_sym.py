"""Fused symmetric int8 Pallas kernel — the fastest LD engine.

Combines every measured win in one kernel (reference hot loop:
``nldsc/ldscore/_ldscore/ldscalc.h:23-54``, redesigned for the MXU):

* **int8×int8→int32 MXU dots** over genotype codes — exact, ~2× the bf16
  single-pass rate on v5e (``ld_int8.py`` module docstring has the
  algebra, incl. the cancellation-free class-count dominance epilogue);
* **r² symmetry**: each pivot block multiplies only its RIGHT half-band —
  3 (no-missing) / 8 (missing) half-band matmuls instead of the
  full-band engine's 2 / 6, a 4/3 (resp. 3/2) flop saving;
* **no scan carry**: pivot blocks are a *parallel* grid dimension (the
  XLA symmetric engine serializes on a credit-accumulating scan);
  mirrored "column" credits are written to a per-(pivot, k) tile output
  and segment-summed outside the kernel — O(M·right_k) f32, trivial;
* **fully fused epilogue**: correlation tiles, adjusted-r², window masks
  and row/col sums live only in VMEM — no (B×W) tile ever reaches HBM.

Grid ``(n_blocks, right_k, n_chunks)`` — pivot blocks parallel, right
half-band and sample-chunk dims sequential (accumulation).  The right
band is a *static* geometry (neighbor block = ``min(b, nb−right_k)+k``),
so unlike the full-band kernel no scalar prefetch is needed; per-pair
window membership is enforced by the integer ``lo/hi`` masks alone.

Outputs ride in TWO f32 arrays (TPU block-shape rules):
  * ``(nb, 8, B)`` pivot-row credits (l2, l2d, ws, wsd, wse, poison);
  * ``(nb, right_k, 8, B)`` mirrored column credits, scattered to their
    owning blocks by a segment-sum after the kernel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ld_int8 import SCAL_FIELDS, corr_from_dots
from .ld_pallas_common import (_L2, _L2D, _WS, _WSD, _WSE, _POI,
                               pack_metadata)
from .ld_pallas_common import pack_scalars
from .ld_xla import finalize_outputs

_LO, _HI, _USABLE, _DOM_OK, _POISON = range(5)


def _kernel(*refs, n_samples: int, n_pad_cols: int, rsq_thr: float,
            block_size: int, nb_base: int, has_missing: bool,
            dot_dtype: str):
    if has_missing:
        (gi_ref, mi_ref, hi_ref, gj_ref, mj_ref, hj_ref,
         meta_i_ref, meta_j_ref, scal_i_ref, scal_j_ref,
         row_ref, col_ref, *accs) = refs
    else:
        (gi_ref, hi_ref, gj_ref, hj_ref,
         meta_i_ref, meta_j_ref, scal_i_ref, scal_j_ref,
         row_ref, col_ref, *accs) = refs

    b = pl.program_id(0)
    k = pl.program_id(1)
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    B = block_size

    @pl.when((k == 0) & (c == 0))
    def _init_row():
        row_ref[...] = jnp.zeros_like(row_ref)

    @pl.when(c == 0)
    def _init_tile():
        col_ref[...] = jnp.zeros_like(col_ref)
        for a in accs:
            a[...] = jnp.zeros_like(a)

    dims = (((1,), (1,)), ((), ()))
    if dot_dtype == "int8":
        def dot(x, y):
            return lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.int32)
    else:
        def dot(x, y):
            return lax.dot_general(
                x.astype(jnp.bfloat16), y.astype(jnp.bfloat16), dims,
                preferred_element_type=jnp.float32)

    gi_t, gj_t, hj_t = gi_ref[...], gj_ref[...], hj_ref[...]
    hi_t = hi_ref[...]
    accs[0][...] += dot(gi_t, gj_t)
    accs[1][...] += dot(gi_t, hj_t)
    accs[2][...] += dot(hi_t, gj_t)
    if has_missing:
        mi_t, mj_t = mi_ref[...], mj_ref[...]
        accs[3][...] += dot(gi_t, mj_t)
        accs[4][...] += dot(mi_t, gj_t)
        accs[5][...] += dot(mi_t, mj_t)
        accs[6][...] += dot(mi_t, hj_t)
        accs[7][...] += dot(hi_t, mj_t)

    @pl.when(c == n_chunks - 1)
    def _epilogue():
        n = jnp.float32(n_samples)
        n_padf = jnp.float32(n_pad_cols)
        adj_c = (n - 1.0) / (n - 2.0)

        keys = ("sgg", "sgh", "shg", "sgm", "smg", "smm", "smh", "shm")
        dots = {key: accs[i][...].astype(jnp.float32)
                for i, key in enumerate(keys[:len(accs)])}
        sc_i = {f: scal_i_ref[0, i, :][:, None]
                for i, f in enumerate(SCAL_FIELDS)}
        sc_j = {f: scal_j_ref[0, i, :][None, :]
                for i, f in enumerate(SCAL_FIELDS)}

        r_add, r_dom_a, r_dom_b = corr_from_dots(
            dots, sc_i, sc_j, n, n_padf, has_missing, symmetric=True)
        adj_add = 1.0 - (1.0 - r_add * r_add) * adj_c
        adj_da = 1.0 - (1.0 - r_dom_a * r_dom_a) * adj_c
        adj_db = 1.0 - (1.0 - r_dom_b * r_dom_b) * adj_c

        r0 = b * B
        jblk = jnp.minimum(b, nb_base) + k
        iota_r = lax.broadcasted_iota(jnp.int32, (B, B), 0)
        iota_c = lax.broadcasted_iota(jnp.int32, (B, B), 1)
        gi = r0 + iota_r
        gj = jblk * B + iota_c

        lo_i = meta_i_ref[0, _LO, :][:, None]
        hi_i = meta_i_ref[0, _HI, :][:, None]
        usable_i = meta_i_ref[0, _USABLE, :][:, None] > 0
        dom_ok_i = meta_i_ref[0, _DOM_OK, :][:, None] > 0
        poison_i = meta_i_ref[0, _POISON, :][:, None] > 0
        usable_j = meta_j_ref[0, _USABLE, :][None, :] > 0
        dom_ok_j = meta_j_ref[0, _DOM_OK, :][None, :] > 0
        poison_j = meta_j_ref[0, _POISON, :][None, :] > 0

        # pair masks — identical geometry to ld_scores_int8_sym
        upair = (gj >= lo_i) & (gj <= hi_i) & usable_i & usable_j
        fwd = gj >= r0
        row_base = upair & fwd & (gj != gi)
        col_base = upair & (gj >= r0 + B)
        dm_a = row_base & dom_ok_j
        dm_b = col_base & dom_ok_i

        rowf = row_base.astype(jnp.float32)
        colf = col_base.astype(jnp.float32)
        dmaf = dm_a.astype(jnp.float32)
        dmbf = dm_b.astype(jnp.float32)

        row_ref[0, _L2, :] += jnp.sum(adj_add * rowf, axis=1)
        row_ref[0, _L2D, :] += jnp.sum(adj_da * dmaf, axis=1)
        row_ref[0, _WS, :] += jnp.sum(rowf, axis=1)
        row_ref[0, _WSD, :] += jnp.sum(dmaf, axis=1)
        row_ref[0, _WSE, :] += jnp.sum(
            jnp.where(adj_da > jnp.float32(rsq_thr), dmaf, 0.0), axis=1)
        row_ref[0, _POI, :] += jnp.sum(
            (upair & fwd & poison_j).astype(jnp.float32), axis=1)

        col_ref[0, 0, _L2, :] = jnp.sum(adj_add * colf, axis=0)
        col_ref[0, 0, _L2D, :] = jnp.sum(adj_db * dmbf, axis=0)
        col_ref[0, 0, _WS, :] = jnp.sum(colf, axis=0)
        col_ref[0, 0, _WSD, :] = jnp.sum(dmbf, axis=0)
        col_ref[0, 0, _WSE, :] = jnp.sum(
            jnp.where(adj_db > jnp.float32(rsq_thr), dmbf, 0.0), axis=0)
        col_ref[0, 0, _POI, :] = jnp.sum(
            (upair & poison_i & (gj >= r0 + B)).astype(jnp.float32), axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("rsq_thr", "block_size", "right_k", "n_samples",
                     "sample_chunk", "interpret", "has_missing",
                     "dot_dtype"))
def ld_scores_pallas_int8_sym(g, m, h, scal, lo, hi, usable, dom_ok,
                              add_sd_zero, *, rsq_thr: float,
                              block_size: int, right_k: int, n_samples: int,
                              sample_chunk: int = 2048,
                              interpret: bool = False,
                              has_missing: bool = True,
                              dot_dtype: str = "int8"):
    """Symmetric banded LD pass, fully fused (same contract as
    :func:`nldsc_tpu.ld.ld_int8.ld_scores_int8_sym` minus the band-block
    vectors, which this kernel's static right-band geometry replaces)."""
    m_pad, n_pad = g.shape
    B = block_size
    nb = m_pad // B
    right_k = min(right_k, nb)
    nb_base = nb - right_k
    nc = max(128, (min(sample_chunk, n_pad) // 128) * 128)
    while n_pad % nc != 0:
        nc -= 128
    n_chunks = n_pad // nc

    meta = pack_metadata(lo, hi, usable, dom_ok, add_sd_zero, nb, B)
    scal_p = pack_scalars(scal, nb, B)

    kern = functools.partial(
        _kernel, n_samples=n_samples, n_pad_cols=n_pad,
        rsq_thr=float(rsq_thr), block_size=B, nb_base=nb_base,
        has_missing=has_missing, dot_dtype=dot_dtype)

    def pivot_map(b, k, c):
        return (b, c)

    def nbr_map(b, k, c):
        return (jnp.minimum(b, nb_base) + k, c)

    def meta_i_map(b, k, c):
        return (b, 0, 0)

    def meta_j_map(b, k, c):
        return (jnp.minimum(b, nb_base) + k, 0, 0)

    def col_map(b, k, c):
        return (b, k, 0, 0)

    tile = lambda imap: pl.BlockSpec((B, nc), imap)  # noqa: E731
    if has_missing:
        in_specs = [tile(pivot_map), tile(pivot_map), tile(pivot_map),
                    tile(nbr_map), tile(nbr_map), tile(nbr_map)]
        inputs = (g, m, h, g, m, h)
        n_acc = 8
    else:
        in_specs = [tile(pivot_map), tile(pivot_map),
                    tile(nbr_map), tile(nbr_map)]
        inputs = (g, h, g, h)
        n_acc = 3
    in_specs += [
        pl.BlockSpec((1, 8, B), meta_i_map),
        pl.BlockSpec((1, 8, B), meta_j_map),
        pl.BlockSpec((1, 16, B), meta_i_map),
        pl.BlockSpec((1, 16, B), meta_j_map),
    ]
    acc_dtype = jnp.int32 if dot_dtype == "int8" else jnp.float32

    n_dots = n_acc
    out_row, out_col = pl.pallas_call(
        kern,
        grid=(nb, right_k, n_chunks),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, 8, B), meta_i_map),
                   pl.BlockSpec((1, 1, 8, B), col_map)),
        out_shape=(jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
                   jax.ShapeDtypeStruct((nb, right_k, 8, B), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((B, B), acc_dtype)] * n_acc,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_dots * m_pad * right_k * B * n_pad,
            bytes_accessed=(3 if has_missing else 2) * m_pad * n_pad,
            transcendentals=0),
        interpret=interpret,
    )(*inputs, meta, meta, scal_p, scal_p)

    row = out_row.transpose(1, 0, 2).reshape(8, m_pad)
    # scatter the mirrored column credits to their owning blocks
    tgt = (np.minimum(np.arange(nb), nb_base)[:, None]
           + np.arange(right_k)[None, :]).reshape(-1)
    colsum = jax.ops.segment_sum(
        out_col.reshape(nb * right_k, 8, B), jnp.asarray(tgt),
        num_segments=nb)
    col = colsum.transpose(1, 0, 2).reshape(8, m_pad)

    tot = row + col
    l2_acc, l2d_acc = tot[_L2], tot[_L2D]
    ws, wsd, wse, poison = (tot[i].astype(jnp.int32)
                            for i in (_WS, _WSD, _WSE, _POI))
    return finalize_outputs(l2_acc, l2d_acc, ws, wsd, wse, poison,
                            usable, add_sd_zero)
