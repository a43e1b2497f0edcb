"""Split-missing symmetric integer engine: clean-rate LD with sparse missing.

The global integer engines pay the 8-matmul missing epilogue for EVERY
tile as soon as ANY genotype in the matrix is missing (``has_missing`` is
a whole-pass static).  But the missing corrections are nonzero only for
pairs where at least one member row actually contains a missing genotype
— in real data a minority of SNPs.  This engine makes the missing cost
proportional to that minority:

  pass 1 (per pivot block) — the 3-matmul CLEAN symmetric epilogue over
      *all* pairs.  For pairs of two clean rows this is already exact
      (their ``u``-dots collapse to per-row integer sums); for pairs
      touching a contaminated row it produces a deterministic wrong value
      that pass 2 cancels.

  pass 2 (same pivot block, fused into the same scan step) — exact
      corrections ``δ = adj(r_exact) − adj(r_clean)`` for every pair with
      a contaminated member, against COMPACTED contaminated rows:

        (a) any pivot row × contaminated band rows   (≤ Pj per block)
        (b) contaminated pivot rows × clean band rows (≤ Pi per block)

      Disjoint cover: (a) takes every pair whose *neighbor* is
      contaminated; (b) takes the rest (contaminated pivot, clean
      neighbor).

Performance structure (what keeps pass 2 cheap on the MXU/VPU):

  * contaminated rows are gathered ONCE into compact (Mm, N) matrices
    before the scan; each block's compact pivots/band rows are then
    CONTIGUOUS ranges of those (the compact order is the global row
    order), so the scan uses only ``dynamic_slice`` — no per-step gathers;
  * each correction side needs 8 exact S-matrices; stacking the *small*
    operand computes them in 3 matmul launches with zero wasted flops
    (e.g. side (a): ``g_i × [g|m|h]_jc``, ``m_i × [g|m|h]_jc``,
    ``h_i × [g|m]_jc``);
  * compact-row credits accumulate in compact-length carries via
    contiguous ``dynamic_update_slice`` and are scattered into the full
    vectors ONCE after the scan.

Flop model per tile (B pivot rows, W band rows, Pi/Pj compact widths):
``3·B·W + 8·B·Pj + 8·Pi·W`` vs the global missing engine's ``8·B·W`` —
at 2% contaminated rows ≈ 1.2× the clean pass instead of 2.7×.

Exactness: contaminated-pair values come from the SAME exact integer
S-matrices as the global engine (bitwise-identical adjusted r²), so the
value-dependent WSE counter matches the global engine exactly; the f32
L2/L2D sums differ only by summation order (≤ a few ulp).  The clean
pass-1 value for a contaminated pair and its pass-2 ``−adj(r_clean)``
term are the same expression tree on the same exact-integer inputs, so
the correction cancels it to f32 rounding.

Reference semantics anchor: per-pair adjusted r² and counters,
``ldscalc.h:23-60``; missing = mean-impute after MAF, ``encoder.h:99-129``.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .ld_int8 import corr_from_dots, make_idot, scal_views
from .ld_xla import finalize_outputs


def plan_missing_compaction(rowmiss: np.ndarray, block_size: int,
                            right_k: int, n_blocks: int, m_pad: int,
                            pad_to: int = 8) -> dict:
    """Host-side compaction plan for the split engine.

    Parameters
    ----------
    rowmiss : bool (m_pad,) — rows with ≥1 true missing genotype AND
        usable (unusable rows contribute to no pair in either pass, so
        excluding them is exact and keeps Pi/Pj tight).
    block_size, right_k, n_blocks, m_pad : symmetric engine geometry.

    Returns a dict of host arrays: ``miss_idx`` int32 (mm_pad,) sorted
    global indices of contaminated rows (tail padded with ``m_pad - 1``
    sentinels that never receive credits), per-block contiguous ranges
    ``piv_start``/``piv_cnt`` and ``band_start``/``band_cnt`` into it,
    and the static widths ``pi``/``pj``/``mm_pad``.
    """
    B = block_size
    right_rows = min(right_k * B, m_pad)
    miss = np.flatnonzero(rowmiss).astype(np.int32)

    piv_start = np.searchsorted(miss, np.arange(n_blocks) * B).astype(np.int32)
    piv_end = np.searchsorted(miss, np.arange(1, n_blocks + 1) * B)
    j0s = np.minimum(np.arange(n_blocks) * B, m_pad - right_rows)
    band_start = np.searchsorted(miss, j0s).astype(np.int32)
    band_end = np.searchsorted(miss, j0s + right_rows)

    def pad_dim(count):
        p = int(count.max()) if len(count) else 0
        return max(pad_to, -(-p // pad_to) * pad_to)

    pi = pad_dim(piv_end - piv_start)
    pj = pad_dim(band_end - band_start)
    # every per-block slice [start, start + P) must stay in bounds
    mm_pad = len(miss) + max(pi, pj)
    miss_idx = np.full(mm_pad, m_pad - 1, dtype=np.int32)
    miss_idx[: len(miss)] = miss
    return {"miss_idx": miss_idx,
            "piv_start": piv_start,
            "piv_cnt": (piv_end - piv_start).astype(np.int32),
            "band_start": band_start,
            "band_cnt": (band_end - band_start).astype(np.int32),
            "pi": pi, "pj": pj, "mm_pad": mm_pad,
            "n_miss": len(miss)}


#: the exact-integer contraction primitive is shared with ld_int8
_idot_pair = make_idot


def _compact_dots(idot, g_a, m_a, h_a, g_b, m_b, h_b, small_side: str):
    """All 8 missing-path S-matrices between rows a and rows b.

    Stacks the SMALL side's operands so the MXU sees 3 launches with zero
    wasted flops instead of 8 skinny ones.  ``small_side``: which operand
    set is compact — 'b' stacks [g|m|h]_b as matmul columns, 'a' stacks
    [g|m|h]_a as matmul rows.
    """
    if small_side == "b":
        k = g_b.shape[0]
        gmh = jnp.concatenate([g_b, m_b, h_b], axis=0)
        gm = gmh[: 2 * k]
        s_g = idot(g_a, gmh)         # g·g | g·m | g·h
        s_m = idot(m_a, gmh)         # m·g | m·m | m·h
        s_h = idot(h_a, gm)          # h·g | h·m
        return {"sgg": s_g[:, :k], "sgm": s_g[:, k:2 * k],
                "sgh": s_g[:, 2 * k:],
                "smg": s_m[:, :k], "smm": s_m[:, k:2 * k],
                "smh": s_m[:, 2 * k:],
                "shg": s_h[:, :k], "shm": s_h[:, k:2 * k]}
    k = g_a.shape[0]
    gmh = jnp.concatenate([g_a, m_a, h_a], axis=0)
    gm = gmh[: 2 * k]
    s_g = idot(gmh, g_b)             # g·g / m·g / h·g
    s_m = idot(gmh, m_b)             # g·m / m·m / h·m
    s_h = idot(gm, h_b)              # g·h / m·h
    return {"sgg": s_g[:k], "smg": s_g[k:2 * k], "shg": s_g[2 * k:],
            "sgm": s_m[:k], "smm": s_m[k:2 * k], "shm": s_m[2 * k:],
            "sgh": s_h[:k], "smh": s_h[k:2 * k]}


@partial(jax.jit, static_argnames=("block_size", "right_k", "n_samples",
                                   "n_scan_blocks", "pi", "pj", "dot_dtype",
                                   "parts"))
def sym_scan_segment_split(g, m, h, scal, lo, hi, usable, dom_ok,
                           add_sd_zero, rowmiss, rsq_thr, blk0,
                           miss_idx, piv_start, piv_cnt, band_start,
                           band_cnt, *, block_size: int, right_k: int,
                           n_samples: int, n_scan_blocks: int, pi: int,
                           pj: int, dot_dtype: str = "int8",
                           parts: str = "ab"):
    """Split-missing credit accumulation for pivot blocks
    ``[blk0, blk0 + n_scan_blocks)``.

    Same contract as :func:`nldsc_tpu.ld.ld_int8.sym_scan_segment`:
    returns the six UN-finalized full-length credit vectors (l2, ws,
    poison, l2d, wsd, wse); segments tile the block range disjointly.

    ``parts``: which correction sides run — 'ab' (default, exact), or a
    subset for cost ablation/tuning ('a', 'b', ''): results are then
    intentionally WRONG for the skipped pairs.
    """
    m_pad, n_pad_cols = g.shape
    assert n_pad_cols <= (1 << 22)
    B = block_size
    right_rows = min(right_k * B, m_pad)
    mm_pad = miss_idx.shape[0]
    n = jnp.float32(n_samples)
    n_padf = jnp.float32(n_pad_cols)
    adj_c = (n - 1.0) / (n - 2.0)
    idot = _idot_pair(dot_dtype)
    i32 = jnp.int32

    # one-time compaction of the contaminated rows (scan uses contiguous
    # slices of these — the compact order IS the global row order).  The
    # gather re-runs per SEGMENT on the progress path; at the 25% auto
    # threshold that is ≤ a few GB of extra HBM reads per whole pass —
    # negligible next to the banded matmuls, so the segment API stays
    # self-contained instead of threading 8 compact arrays through it.
    g_c = jnp.take(g, miss_idx, axis=0)
    m_c = jnp.take(m, miss_idx, axis=0)
    h_c = jnp.take(h, miss_idx, axis=0)
    scal_c = jnp.take(scal, miss_idx, axis=0)
    usable_c = jnp.take(usable, miss_idx)
    dom_ok_c = jnp.take(dom_ok, miss_idx)
    lo_c = jnp.take(lo, miss_idx)
    hi_c = jnp.take(hi, miss_idx)

    def sl(v, at, size):
        return lax.dynamic_slice_in_dim(v, at, size)

    def adj(r):
        return 1.0 - (1.0 - r * r) * adj_c

    def credit(full, at, vals):
        cur = lax.dynamic_slice_in_dim(full, at, vals.shape[0])
        return lax.dynamic_update_slice_in_dim(full, cur + vals, at, 0)

    def step(carry, b):
        (l2_f, ws_f, poi_f, l2d_f, wsd_f, wse_f,
         l2_cf, l2d_cf, wse_cf) = carry
        r0 = b * B
        gi = r0 + jnp.arange(B, dtype=i32)
        g_i = lax.dynamic_slice_in_dim(g, r0, B, axis=0)
        m_i = lax.dynamic_slice_in_dim(m, r0, B, axis=0)
        h_i = lax.dynamic_slice_in_dim(h, r0, B, axis=0)
        lo_i = sl(lo, r0, B)[:, None]
        hi_i = sl(hi, r0, B)[:, None]
        usable_i = sl(usable, r0, B)[:, None]
        poison_i = sl(add_sd_zero, r0, B)[:, None]
        dom_ok_i = sl(dom_ok, r0, B)[:, None]
        sc_i = scal_views(lax.dynamic_slice_in_dim(scal, r0, B, axis=0),
                          "col")

        j0 = jnp.minimum(r0, m_pad - right_rows)
        gj = j0 + jnp.arange(right_rows, dtype=i32)
        g_j = lax.dynamic_slice_in_dim(g, j0, right_rows, axis=0)
        m_j = lax.dynamic_slice_in_dim(m, j0, right_rows, axis=0)
        h_j = lax.dynamic_slice_in_dim(h, j0, right_rows, axis=0)
        usable_j = sl(usable, j0, right_rows)[None, :]
        poison_j = sl(add_sd_zero, j0, right_rows)[None, :]
        dom_ok_j = sl(dom_ok, j0, right_rows)[None, :]
        clean_j = ~sl(rowmiss, j0, right_rows)[None, :]
        sc_j = scal_views(
            lax.dynamic_slice_in_dim(scal, j0, right_rows, axis=0), "row")

        # ---- pass 1: clean epilogue over ALL pairs (3 matmuls) ----
        dots = {"sgg": idot(g_i, g_j), "sgh": idot(g_i, h_j),
                "shg": idot(h_i, g_j)}
        r_add, r_dom_a, r_dom_b = corr_from_dots(
            dots, sc_i, sc_j, n, n_padf, has_missing=False, symmetric=True)
        adj_add, adj_dA, adj_dB = adj(r_add), adj(r_dom_a), adj(r_dom_b)

        in_win = (gj[None, :] >= lo_i) & (gj[None, :] <= hi_i)
        upair = in_win & usable_j & usable_i
        fwd = gj[None, :] >= r0
        row_base = upair & fwd & (gj[None, :] != gi[:, None])
        col_base = upair & (gj[None, :] >= r0 + B)
        dmA = row_base & dom_ok_j
        dmB = col_base & dom_ok_i

        l2_f = credit(credit(l2_f, r0, jnp.sum(adj_add * row_base, axis=1)),
                      j0, jnp.sum(adj_add * col_base, axis=0))
        ws_f = credit(
            credit(ws_f, r0, jnp.sum(row_base, axis=1).astype(i32)),
            j0, jnp.sum(col_base, axis=0).astype(i32))
        poi_f = credit(
            credit(poi_f, r0,
                   jnp.sum(upair & fwd & poison_j, axis=1).astype(i32)),
            j0, jnp.sum(upair & poison_i & (gj[None, :] >= r0 + B),
                        axis=0).astype(i32))
        l2d_f = credit(credit(l2d_f, r0, jnp.sum(adj_dA * dmA, axis=1)),
                       j0, jnp.sum(adj_dB * dmB, axis=0))
        wsd_f = credit(
            credit(wsd_f, r0, jnp.sum(dmA, axis=1).astype(i32)),
            j0, jnp.sum(dmB, axis=0).astype(i32))
        wse_f = credit(
            credit(wse_f, r0,
                   jnp.sum((adj_dA > rsq_thr) & dmA, axis=1).astype(i32)),
            j0, jnp.sum((adj_dB > rsq_thr) & dmB, axis=0).astype(i32))

        acc = (l2_f, l2d_f, wse_f, l2_cf, l2d_cf, wse_cf)

        def pass_2a(acc):
            # ---- pass 2a: all pivot rows × contaminated band rows ----
            (l2_f, l2d_f, wse_f, l2_cf, l2d_cf, wse_cf) = acc
            a0 = band_start[b]
            idxa = sl(miss_idx, a0, pj)
            va = (jnp.arange(pj, dtype=i32) < band_cnt[b])[None, :]
            g_jc = lax.dynamic_slice_in_dim(g_c, a0, pj, axis=0)
            m_jc = lax.dynamic_slice_in_dim(m_c, a0, pj, axis=0)
            h_jc = lax.dynamic_slice_in_dim(h_c, a0, pj, axis=0)
            sc_jc = scal_views(
                lax.dynamic_slice_in_dim(scal_c, a0, pj, axis=0), "row")
            usable_jc = sl(usable_c, a0, pj)[None, :]
            dom_ok_jc = sl(dom_ok_c, a0, pj)[None, :]

            dots_a = _compact_dots(idot, g_i, m_i, h_i, g_jc, m_jc, h_jc,
                                   "b")
            rA0, rDa0, rDb0 = corr_from_dots(dots_a, sc_i, sc_jc, n, n_padf,
                                             has_missing=False,
                                             symmetric=True)
            rAx, rDax, rDbx = corr_from_dots(dots_a, sc_i, sc_jc, n, n_padf,
                                             has_missing=True,
                                             symmetric=True)
            d_add_a = adj(rAx) - adj(rA0)
            aDax, aDa0 = adj(rDax), adj(rDa0)
            aDbx, aDb0 = adj(rDbx), adj(rDb0)

            in_win_a = (idxa[None, :] >= lo_i) & (idxa[None, :] <= hi_i)
            upair_a = in_win_a & usable_jc & usable_i & va
            fwd_a = idxa[None, :] >= r0
            row_a = upair_a & fwd_a & (idxa[None, :] != gi[:, None])
            col_a = upair_a & (idxa[None, :] >= r0 + B)
            dmA_a = row_a & dom_ok_jc
            dmB_a = col_a & dom_ok_i

            l2_f = credit(l2_f, r0, jnp.sum(d_add_a * row_a, axis=1))
            l2d_f = credit(l2d_f, r0,
                           jnp.sum((aDax - aDa0) * dmA_a, axis=1))
            wse_f = credit(
                wse_f, r0,
                jnp.sum(jnp.where(dmA_a, (aDax > rsq_thr).astype(i32)
                                  - (aDa0 > rsq_thr).astype(i32), 0),
                        axis=1))
            l2_cf = credit(l2_cf, a0, jnp.sum(d_add_a * col_a, axis=0))
            l2d_cf = credit(l2d_cf, a0,
                            jnp.sum((aDbx - aDb0) * dmB_a, axis=0))
            wse_cf = credit(
                wse_cf, a0,
                jnp.sum(jnp.where(dmB_a, (aDbx > rsq_thr).astype(i32)
                                  - (aDb0 > rsq_thr).astype(i32), 0),
                        axis=0))
            return (l2_f, l2d_f, wse_f, l2_cf, l2d_cf, wse_cf)

        def pass_2b(acc):
            # ---- pass 2b: contaminated pivot rows × CLEAN band rows ----
            (l2_f, l2d_f, wse_f, l2_cf, l2d_cf, wse_cf) = acc
            b0 = piv_start[b]
            idxb = sl(miss_idx, b0, pi)
            vb = (jnp.arange(pi, dtype=i32) < piv_cnt[b])[:, None]
            g_ic = lax.dynamic_slice_in_dim(g_c, b0, pi, axis=0)
            m_ic = lax.dynamic_slice_in_dim(m_c, b0, pi, axis=0)
            h_ic = lax.dynamic_slice_in_dim(h_c, b0, pi, axis=0)
            sc_ic = scal_views(
                lax.dynamic_slice_in_dim(scal_c, b0, pi, axis=0), "col")
            usable_ic = sl(usable_c, b0, pi)[:, None]
            dom_ok_ic = sl(dom_ok_c, b0, pi)[:, None]
            lo_ic = sl(lo_c, b0, pi)[:, None]
            hi_ic = sl(hi_c, b0, pi)[:, None]

            dots_b = _compact_dots(idot, g_ic, m_ic, h_ic, g_j, m_j, h_j,
                                   "a")
            rB0, rDa0b, rDb0b = corr_from_dots(dots_b, sc_ic, sc_j, n,
                                               n_padf, has_missing=False,
                                               symmetric=True)
            rBx, rDaxb, rDbxb = corr_from_dots(dots_b, sc_ic, sc_j, n,
                                               n_padf, has_missing=True,
                                               symmetric=True)
            d_add_b = adj(rBx) - adj(rB0)
            bDax, bDa0 = adj(rDaxb), adj(rDa0b)
            bDbx, bDb0 = adj(rDbxb), adj(rDb0b)

            in_win_b = (gj[None, :] >= lo_ic) & (gj[None, :] <= hi_ic)
            upair_b = in_win_b & usable_j & usable_ic & vb & clean_j
            fwd_b = gj[None, :] >= r0
            row_b = upair_b & fwd_b & (gj[None, :] != idxb[:, None])
            col_b = upair_b & (gj[None, :] >= r0 + B)
            dmA_b = row_b & dom_ok_j
            dmB_b = col_b & dom_ok_ic

            l2_cf = credit(l2_cf, b0, jnp.sum(d_add_b * row_b, axis=1))
            l2d_cf = credit(l2d_cf, b0,
                            jnp.sum((bDax - bDa0) * dmA_b, axis=1))
            wse_cf = credit(
                wse_cf, b0,
                jnp.sum(jnp.where(dmA_b, (bDax > rsq_thr).astype(i32)
                                  - (bDa0 > rsq_thr).astype(i32), 0),
                        axis=1))
            l2_f = credit(l2_f, j0, jnp.sum(d_add_b * col_b, axis=0))
            l2d_f = credit(l2d_f, j0,
                           jnp.sum((bDbx - bDb0) * dmB_b, axis=0))
            wse_f = credit(
                wse_f, j0,
                jnp.sum(jnp.where(dmB_b, (bDbx > rsq_thr).astype(i32)
                                  - (bDb0 > rsq_thr).astype(i32), 0),
                        axis=0))
            return (l2_f, l2d_f, wse_f, l2_cf, l2d_cf, wse_cf)

        if "a" in parts:
            acc = pass_2a(acc)
        if "b" in parts:
            acc = pass_2b(acc)
        (l2_f, l2d_f, wse_f, l2_cf, l2d_cf, wse_cf) = acc

        return (l2_f, ws_f, poi_f, l2d_f, wsd_f, wse_f,
                l2_cf, l2d_cf, wse_cf), None

    zf = jnp.zeros(m_pad, jnp.float32)
    zi = jnp.zeros(m_pad, jnp.int32)
    zcf = jnp.zeros(mm_pad, jnp.float32)
    zci = jnp.zeros(mm_pad, jnp.int32)
    carry, _ = lax.scan(
        step, (zf, zi, zi, zf, zi, zi, zcf, zcf, zci),
        blk0 + jnp.arange(n_scan_blocks, dtype=i32))
    (l2_f, ws_f, poi_f, l2d_f, wsd_f, wse_f, l2_cf, l2d_cf, wse_cf) = carry
    # fold the compact-row credits back ONCE (padded sentinel slots carry
    # exact zeros, so the duplicate m_pad-1 targets are no-ops)
    l2_f = l2_f.at[miss_idx].add(l2_cf)
    l2d_f = l2d_f.at[miss_idx].add(l2d_cf)
    wse_f = wse_f.at[miss_idx].add(wse_cf)
    return (l2_f, ws_f, poi_f, l2d_f, wsd_f, wse_f)


@partial(jax.jit, static_argnames=("block_size", "right_k", "n_samples",
                                   "n_piv_blocks", "pi", "pj", "dot_dtype"))
def banded_chunk_int8_split(pre, dom_ok_b, lo_piv, hi_piv, band_g0, m_pad,
                            rsq_thr, rowmiss_b, miss_idx, piv_start,
                            piv_cnt, band_start, band_cnt, *,
                            block_size: int, right_k: int, n_samples: int,
                            n_piv_blocks: int, pi: int, pj: int,
                            dot_dtype: str = "int8"):
    """Split-missing variant of the symmetric streaming chunk pass.

    Same geometry and return contract as
    :func:`nldsc_tpu.ld.streaming._banded_chunk_int8_sym` — band holds
    ``[p0, p1 + halo)``, returns ((6, chunk_rows) local sums, (6, halo)
    forward credit tail; quantity order l2, ws, poison, l2d, wsd, wse,
    counters as f32) — but runs the clean 3-matmul epilogue over all
    pairs and exact compact corrections for the band's contaminated rows
    (the in-core :func:`sym_scan_segment_split` algebra with band-LOCAL
    compaction indices; the per-chunk plan comes from
    :func:`plan_missing_compaction` called on the band's rowmiss with
    ``m_pad := ext_rows``).
    """
    from .ld_int8 import scal_views, stack_scalars  # noqa: PLC0415

    B = block_size
    chunk_rows = n_piv_blocks * B
    ext_rows = pre["g"].shape[0]
    halo = ext_rows - chunk_rows
    right_rows = min(right_k * B, ext_rows)
    n = jnp.float32(n_samples)
    n_padf = jnp.float32(pre["g"].shape[1])
    adj_c = (n - 1.0) / (n - 2.0)
    idot = _idot_pair(dot_dtype)
    g, m, h = pre["g"], pre["m"], pre["h"]
    usable_b = pre["usable"]
    poison_b = pre["add_sd_zero"]
    scal = stack_scalars(pre)

    g_c = jnp.take(g, miss_idx, axis=0)
    m_c = jnp.take(m, miss_idx, axis=0)
    h_c = jnp.take(h, miss_idx, axis=0)
    scal_c = jnp.take(scal, miss_idx, axis=0)
    usable_c = jnp.take(usable_b, miss_idx)
    dom_ok_c = jnp.take(dom_ok_b, miss_idx)
    # lo/hi are pivot-indexed (chunk-local); compact pivot rows only ever
    # come from the chunk, so index them with the same local offsets
    lo_c = jnp.take(lo_piv, jnp.clip(miss_idx, 0, chunk_rows - 1))
    hi_c = jnp.take(hi_piv, jnp.clip(miss_idx, 0, chunk_rows - 1))

    def sl(v, at, size):
        return lax.dynamic_slice_in_dim(v, at, size)

    def adj(r):
        return 1.0 - (1.0 - r * r) * adj_c

    def credit(full, at, vals):
        cur = lax.dynamic_slice_in_dim(full, at, vals.shape[0])
        return lax.dynamic_update_slice_in_dim(full, cur + vals, at, 0)

    f32 = jnp.float32

    def step(carry, b):
        (row_acc, col_acc, l2_cf, l2d_cf, wse_cf) = carry
        r0 = b * B
        gr0 = band_g0 + r0
        gi = gr0 + jnp.arange(B, dtype=jnp.int32)
        g_i = lax.dynamic_slice_in_dim(g, r0, B, axis=0)
        m_i = lax.dynamic_slice_in_dim(m, r0, B, axis=0)
        h_i = lax.dynamic_slice_in_dim(h, r0, B, axis=0)
        lo_i = sl(lo_piv, r0, B)[:, None]
        hi_i = sl(hi_piv, r0, B)[:, None]
        usable_i = sl(usable_b, r0, B)[:, None]
        poison_i = sl(poison_b, r0, B)[:, None]
        dom_ok_i = sl(dom_ok_b, r0, B)[:, None]
        sc_i = scal_views(lax.dynamic_slice_in_dim(scal, r0, B, axis=0),
                          "col")

        j0 = jnp.minimum(r0, ext_rows - right_rows)
        gj = band_g0 + j0 + jnp.arange(right_rows, dtype=jnp.int32)
        g_j = lax.dynamic_slice_in_dim(g, j0, right_rows, axis=0)
        m_j = lax.dynamic_slice_in_dim(m, j0, right_rows, axis=0)
        h_j = lax.dynamic_slice_in_dim(h, j0, right_rows, axis=0)
        in_range = gj < m_pad
        usable_j = (sl(usable_b, j0, right_rows) & in_range)[None, :]
        poison_j = (sl(poison_b, j0, right_rows) & in_range)[None, :]
        dom_ok_j = (sl(dom_ok_b, j0, right_rows) & in_range)[None, :]
        clean_j = ~sl(rowmiss_b, j0, right_rows)[None, :]
        sc_j = scal_views(lax.dynamic_slice_in_dim(scal, j0, right_rows,
                                                   axis=0), "row")

        # ---- pass 1: clean epilogue over ALL pairs ----
        dots = {"sgg": idot(g_i, g_j), "sgh": idot(g_i, h_j),
                "shg": idot(h_i, g_j)}
        r_add, r_dom_a, r_dom_b = corr_from_dots(
            dots, sc_i, sc_j, n, n_padf, has_missing=False, symmetric=True)
        adj_add, adj_dA, adj_dB = adj(r_add), adj(r_dom_a), adj(r_dom_b)

        in_win = (gj[None, :] >= lo_i) & (gj[None, :] <= hi_i)
        upair = in_win & usable_j & usable_i
        fwd = gj[None, :] >= gr0
        row_base = upair & fwd & (gj[None, :] != gi[:, None])
        col_base = upair & (gj[None, :] >= gr0 + B)
        dmA = row_base & dom_ok_j
        dmB = col_base & dom_ok_i

        rows_b = jnp.stack([
            jnp.sum(adj_add * row_base, axis=1),
            jnp.sum(row_base, axis=1).astype(f32),
            jnp.sum(upair & fwd & poison_j, axis=1).astype(f32),
            jnp.sum(adj_dA * dmA, axis=1),
            jnp.sum(dmA, axis=1).astype(f32),
            jnp.sum((adj_dA > rsq_thr) & dmA, axis=1).astype(f32),
        ])
        cols_b = jnp.stack([
            jnp.sum(adj_add * col_base, axis=0),
            jnp.sum(col_base, axis=0).astype(f32),
            jnp.sum(upair & poison_i & (gj[None, :] >= gr0 + B),
                    axis=0).astype(f32),
            jnp.sum(adj_dB * dmB, axis=0),
            jnp.sum(dmB, axis=0).astype(f32),
            jnp.sum((adj_dB > rsq_thr) & dmB, axis=0).astype(f32),
        ])
        row_acc = lax.dynamic_update_slice_in_dim(
            row_acc, lax.dynamic_slice_in_dim(row_acc, r0, B, axis=1)
            + rows_b, r0, axis=1)
        col_acc = lax.dynamic_update_slice_in_dim(
            col_acc, lax.dynamic_slice_in_dim(col_acc, j0, right_rows,
                                              axis=1) + cols_b, j0, axis=1)

        # ---- pass 2a: all pivot rows × contaminated band rows ----
        a0 = band_start[b]
        idxa = sl(miss_idx, a0, pj)                  # band-LOCAL indices
        gidxa = band_g0 + idxa
        va = (jnp.arange(pj, dtype=jnp.int32) < band_cnt[b])[None, :]
        g_jc = lax.dynamic_slice_in_dim(g_c, a0, pj, axis=0)
        m_jc = lax.dynamic_slice_in_dim(m_c, a0, pj, axis=0)
        h_jc = lax.dynamic_slice_in_dim(h_c, a0, pj, axis=0)
        sc_jc = scal_views(lax.dynamic_slice_in_dim(scal_c, a0, pj, axis=0),
                           "row")
        usable_jc = (sl(usable_c, a0, pj) & (gidxa < m_pad))[None, :]
        dom_ok_jc = sl(dom_ok_c, a0, pj)[None, :]

        dots_a = _compact_dots(idot, g_i, m_i, h_i, g_jc, m_jc, h_jc, "b")
        rA0, rDa0, rDb0 = corr_from_dots(dots_a, sc_i, sc_jc, n, n_padf,
                                         has_missing=False, symmetric=True)
        rAx, rDax, rDbx = corr_from_dots(dots_a, sc_i, sc_jc, n, n_padf,
                                         has_missing=True, symmetric=True)
        d_add_a = adj(rAx) - adj(rA0)
        aDax, aDa0 = adj(rDax), adj(rDa0)
        aDbx, aDb0 = adj(rDbx), adj(rDb0)

        in_win_a = (gidxa[None, :] >= lo_i) & (gidxa[None, :] <= hi_i)
        upair_a = in_win_a & usable_jc & usable_i & va
        fwd_a = gidxa[None, :] >= gr0
        row_a = upair_a & fwd_a & (gidxa[None, :] != gi[:, None])
        col_a = upair_a & (gidxa[None, :] >= gr0 + B)
        dmA_a = row_a & dom_ok_jc
        dmB_a = col_a & dom_ok_i

        row_corr = jnp.zeros((6, B), f32)
        row_corr = row_corr.at[0].set(jnp.sum(d_add_a * row_a, axis=1))
        row_corr = row_corr.at[3].set(jnp.sum((aDax - aDa0) * dmA_a, axis=1))
        row_corr = row_corr.at[5].set(jnp.sum(
            jnp.where(dmA_a, (aDax > rsq_thr).astype(f32)
                      - (aDa0 > rsq_thr).astype(f32), 0.0), axis=1))
        row_acc = lax.dynamic_update_slice_in_dim(
            row_acc, lax.dynamic_slice_in_dim(row_acc, r0, B, axis=1)
            + row_corr, r0, axis=1)
        l2_cf = credit(l2_cf, a0, jnp.sum(d_add_a * col_a, axis=0))
        l2d_cf = credit(l2d_cf, a0, jnp.sum((aDbx - aDb0) * dmB_a, axis=0))
        wse_cf = credit(
            wse_cf, a0,
            jnp.sum(jnp.where(dmB_a, (aDbx > rsq_thr).astype(f32)
                              - (aDb0 > rsq_thr).astype(f32), 0.0), axis=0))

        # ---- pass 2b: contaminated pivot rows × CLEAN band rows ----
        b0 = piv_start[b]
        idxb = sl(miss_idx, b0, pi)
        gidxb = band_g0 + idxb
        vb = (jnp.arange(pi, dtype=jnp.int32) < piv_cnt[b])[:, None]
        g_ic = lax.dynamic_slice_in_dim(g_c, b0, pi, axis=0)
        m_ic = lax.dynamic_slice_in_dim(m_c, b0, pi, axis=0)
        h_ic = lax.dynamic_slice_in_dim(h_c, b0, pi, axis=0)
        sc_ic = scal_views(lax.dynamic_slice_in_dim(scal_c, b0, pi, axis=0),
                           "col")
        usable_ic = sl(usable_c, b0, pi)[:, None]
        dom_ok_ic = sl(dom_ok_c, b0, pi)[:, None]
        lo_ic = sl(lo_c, b0, pi)[:, None]
        hi_ic = sl(hi_c, b0, pi)[:, None]

        dots_b = _compact_dots(idot, g_ic, m_ic, h_ic, g_j, m_j, h_j, "a")
        rB0, rDa0b, rDb0b = corr_from_dots(dots_b, sc_ic, sc_j, n, n_padf,
                                           has_missing=False, symmetric=True)
        rBx, rDaxb, rDbxb = corr_from_dots(dots_b, sc_ic, sc_j, n, n_padf,
                                           has_missing=True, symmetric=True)
        d_add_b = adj(rBx) - adj(rB0)
        bDax, bDa0 = adj(rDaxb), adj(rDa0b)
        bDbx, bDb0 = adj(rDbxb), adj(rDb0b)

        in_win_b = (gj[None, :] >= lo_ic) & (gj[None, :] <= hi_ic)
        upair_b = in_win_b & usable_j & usable_ic & vb & clean_j
        fwd_b = gj[None, :] >= gr0
        row_b = upair_b & fwd_b & (gj[None, :] != gidxb[:, None])
        col_b = upair_b & (gj[None, :] >= gr0 + B)
        dmA_b = row_b & dom_ok_j
        dmB_b = col_b & dom_ok_ic

        l2_cf = credit(l2_cf, b0, jnp.sum(d_add_b * row_b, axis=1))
        l2d_cf = credit(l2d_cf, b0, jnp.sum((bDax - bDa0) * dmA_b, axis=1))
        wse_cf = credit(
            wse_cf, b0,
            jnp.sum(jnp.where(dmA_b, (bDax > rsq_thr).astype(f32)
                              - (bDa0 > rsq_thr).astype(f32), 0.0), axis=1))
        col_corr = jnp.zeros((6, right_rows), f32)
        col_corr = col_corr.at[0].set(jnp.sum(d_add_b * col_b, axis=0))
        col_corr = col_corr.at[3].set(jnp.sum((bDbx - bDb0) * dmB_b, axis=0))
        col_corr = col_corr.at[5].set(jnp.sum(
            jnp.where(dmB_b, (bDbx > rsq_thr).astype(f32)
                      - (bDb0 > rsq_thr).astype(f32), 0.0), axis=0))
        col_acc = lax.dynamic_update_slice_in_dim(
            col_acc, lax.dynamic_slice_in_dim(col_acc, j0, right_rows,
                                              axis=1) + col_corr, j0, axis=1)

        return (row_acc, col_acc, l2_cf, l2d_cf, wse_cf), None

    mm_pad = miss_idx.shape[0]
    init = (jnp.zeros((6, chunk_rows), f32), jnp.zeros((6, ext_rows), f32),
            jnp.zeros(mm_pad, f32), jnp.zeros(mm_pad, f32),
            jnp.zeros(mm_pad, f32))
    (row_acc, col_acc, l2_cf, l2d_cf, wse_cf), _ = lax.scan(
        step, init, jnp.arange(n_piv_blocks, dtype=jnp.int32))
    # fold compact-row credits into band space once (sentinel slots carry
    # exact zeros, so duplicate targets are no-ops)
    col_acc = col_acc.at[0, miss_idx].add(l2_cf)
    col_acc = col_acc.at[3, miss_idx].add(l2d_cf)
    col_acc = col_acc.at[5, miss_idx].add(wse_cf)
    local = row_acc + col_acc[:, :chunk_rows]
    tail = col_acc[:, chunk_rows:] if halo > 0 else col_acc[:, :0]
    return local, tail


def ld_scores_int8_split(g, m, h, scal, lo, hi, usable, dom_ok, add_sd_zero,
                         rowmiss, rsq_thr, plan: dict, *, block_size: int,
                         right_k: int, n_samples: int,
                         dot_dtype: str = "int8"):
    """Finalized split-missing symmetric pass over all pivot blocks."""
    accs = sym_scan_segment_split(
        g, m, h, scal, lo, hi, usable, dom_ok, add_sd_zero, rowmiss,
        rsq_thr, jnp.int32(0),
        jnp.asarray(plan["miss_idx"]), jnp.asarray(plan["piv_start"]),
        jnp.asarray(plan["piv_cnt"]), jnp.asarray(plan["band_start"]),
        jnp.asarray(plan["band_cnt"]),
        block_size=block_size, right_k=right_k, n_samples=n_samples,
        n_scan_blocks=g.shape[0] // block_size, pi=plan["pi"],
        pj=plan["pj"], dot_dtype=dot_dtype)
    (l2_acc, ws, poison, l2d_acc, wsd, wse) = accs
    return finalize_outputs(l2_acc, l2d_acc, ws, wsd, wse, poison,
                            usable, add_sd_zero)
