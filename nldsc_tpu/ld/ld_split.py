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

  pass 2 — exact corrections ``δ = adj(r_exact) − adj(r_clean)`` for
      every pair with a contaminated member, against COMPACTED
      contaminated rows.  Two forms live here:

      * IN-CORE (:func:`split_corrections`, the v2 SEGMENTED form used
        by the pipeline): all ordered pairs (x, contaminated c) are
        enumerated with x swept in LARGE row segments, so each big
        operand is read once per segment — for x CLEAN the m_x-side
        dots collapse analytically (smg = smh = 0, smm = the padding
        overlap constant), leaving TWO big launches per segment plus a
        tiny compact product for the contaminated-x rows.  Measured on
        hardware this beats both the per-block v1 form and the global
        8-matmul engine at every tested scale (PERFORMANCE.md).
      * STREAMING (:func:`banded_chunk_int8_split`): per-pivot-block
        compact corrections fused into the chunk scan — contaminated
        rows are gathered once, each block's compact pivots/band rows
        are CONTIGUOUS ranges of the compact arrays, and the 8 compact
        S-matrices per side come from 3 stacked matmul launches
        (:func:`_compact_dots`).

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
    (per-block compact corrections with band-LOCAL compaction indices;
    the per-chunk plan comes from :func:`plan_missing_compaction` called
    on the band's rowmiss with ``m_pad := ext_rows``).
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


# ---------------------------------------------------------------------------
# v2: SEGMENTED corrections — the per-block correction launches above are
# K-loop-bound at huge N (each skinny matmul streams a big operand from HBM
# regardless of its output width; PERFORMANCE.md ablation).  The segmented
# form enumerates every ordered pair (x, contaminated c) once, with x swept
# in LARGE row segments, so the big operands are read once per segment:
#
#   * for x CLEAN, the m_x-side dots collapse analytically: smg = smh = 0
#     (g/h are zero wherever m_x is 1 — only at sample padding, where g/h
#     are zero-padded) and smm = n_pad − n (the padding overlap constant),
#     so the exact epilogue needs only TWO big launches per segment:
#     ``g_x × [g|m|h]_c`` and ``h_x × [g|m]_c``;
#   * the x-CONTAMINATED rows of the segment get their true m_x dots from
#     one tiny compact×compact product scattered into the tiles.
#
# Credit rule (each unordered pair exactly once per side): the (x, c)
# entry always credits the x side; it credits the c side only when x is
# clean (a contaminated x's mirrored credit comes from its own entry as
# the second element).  Pass 1 is the UNMODIFIED clean symmetric scan
# (ld_int8.sym_scan_segment with has_missing=False) — this pass only adds
# δ = adj(exact) − adj(clean) for contaminated pairs.
# ---------------------------------------------------------------------------


def plan_split_v2(rowmiss: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                  seg_rows: int, m_pad: int, pad_to: int = 8) -> dict:
    """Host-side plan for :func:`split_corrections` (v2 segmented form)."""
    miss = np.flatnonzero(rowmiss).astype(np.int32)
    n_segs = max(1, -(-m_pad // seg_rows))
    cs = np.zeros(n_segs, np.int32)
    ce = np.zeros(n_segs, np.int32)
    xs = np.zeros(n_segs, np.int32)
    xe = np.zeros(n_segs, np.int32)
    for s in range(n_segs):
        s0, s1 = s * seg_rows, min((s + 1) * seg_rows, m_pad)
        cl = int(lo[s0:s1].min()) if s1 > s0 else m_pad
        ch = int(hi[s0:s1].max()) if s1 > s0 else -1
        cs[s] = np.searchsorted(miss, cl)
        ce[s] = np.searchsorted(miss, ch + 1)
        xs[s] = np.searchsorted(miss, s0)
        xe[s] = np.searchsorted(miss, s1)

    def pad_dim(count):
        p = int(count.max()) if len(count) else 0
        return max(pad_to, -(-p // pad_to) * pad_to)

    p_band = pad_dim(ce - cs)
    p_x = pad_dim(xe - xs)
    mm_pad = len(miss) + max(p_band, p_x)
    miss_idx = np.full(mm_pad, m_pad - 1, dtype=np.int32)
    miss_idx[: len(miss)] = miss
    return {"miss_idx": miss_idx, "cs": cs, "c_cnt": (ce - cs).astype(np.int32),
            "xs": xs, "x_cnt": (xe - xs).astype(np.int32),
            "p_band": p_band, "p_x": p_x, "mm_pad": mm_pad,
            "n_miss": len(miss), "n_segs": n_segs}


@partial(jax.jit, static_argnames=("seg_rows", "n_segs", "p_band", "p_x",
                                   "n_samples", "dot_dtype"))
def split_corrections(g, m, h, scal, lo, hi, usable, dom_ok, rowmiss,
                      rsq_thr, miss_idx, cs, c_cnt, xs, x_cnt, *,
                      seg_rows: int, n_segs: int, p_band: int, p_x: int,
                      n_samples: int, dot_dtype: str = "int8"):
    """δ-credit vectors for every pair with a contaminated member.

    Returns full-length (l2_δ f32, l2d_δ f32, wse_δ int32) to ADD to the
    clean pass's un-finalized credits.  ``m`` is read only through its
    COMPACTED contaminated rows.
    """
    m_pad, n_pad_cols = g.shape
    n = jnp.float32(n_samples)
    n_padf = jnp.float32(n_pad_cols)
    adj_c = (n - 1.0) / (n - 2.0)
    pad_const = n_padf - n            # smm for clean x = padding overlap
    idot = make_idot(dot_dtype)
    i32 = jnp.int32
    S = seg_rows

    g_c = jnp.take(g, miss_idx, axis=0)
    m_c = jnp.take(m, miss_idx, axis=0)
    h_c = jnp.take(h, miss_idx, axis=0)
    scal_c = jnp.take(scal, miss_idx, axis=0)
    usable_c = jnp.take(usable, miss_idx)
    dom_ok_c = jnp.take(dom_ok, miss_idx)

    def sl(v, at, size):
        return lax.dynamic_slice_in_dim(v, at, size)

    def adj(r):
        return 1.0 - (1.0 - r * r) * adj_c

    def credit(full, at, vals):
        cur = lax.dynamic_slice_in_dim(full, at, vals.shape[0])
        return lax.dynamic_update_slice_in_dim(full, cur + vals, at, 0)

    def step(carry, s):
        l2_f, l2d_f, wse_f, l2_cf, l2d_cf, wse_cf = carry
        s0 = jnp.minimum(s * S, m_pad - S)      # clamped; overlap masked
        xidx = s0 + jnp.arange(S, dtype=i32)
        xvalid = (xidx >= s * S)[:, None]
        g_x = lax.dynamic_slice_in_dim(g, s0, S, axis=0)
        h_x = lax.dynamic_slice_in_dim(h, s0, S, axis=0)
        lo_x = sl(lo, s0, S)[:, None]
        hi_x = sl(hi, s0, S)[:, None]
        usable_x = sl(usable, s0, S)[:, None]
        dom_ok_x = sl(dom_ok, s0, S)[:, None]
        cln_x = ~sl(rowmiss, s0, S)[:, None]
        sc_x = scal_views(lax.dynamic_slice_in_dim(scal, s0, S, axis=0),
                          "col")

        c0 = cs[s]
        cidx = sl(miss_idx, c0, p_band)
        vc = (jnp.arange(p_band, dtype=i32) < c_cnt[s])[None, :]
        g_cc = lax.dynamic_slice_in_dim(g_c, c0, p_band, axis=0)
        m_cc = lax.dynamic_slice_in_dim(m_c, c0, p_band, axis=0)
        h_cc = lax.dynamic_slice_in_dim(h_c, c0, p_band, axis=0)
        sc_c = scal_views(
            lax.dynamic_slice_in_dim(scal_c, c0, p_band, axis=0), "row")
        usable_cc = sl(usable_c, c0, p_band)[None, :]
        dom_ok_cc = sl(dom_ok_c, c0, p_band)[None, :]

        # two big launches (each big operand read once per segment)
        cat3 = jnp.concatenate([g_cc, m_cc, h_cc], axis=0)
        a_t = idot(g_x, cat3)                       # (S, 3P)
        b_t = idot(h_x, cat3[: 2 * p_band])         # (S, 2P)
        # tiny compact product supplies the contaminated-x m-side dots
        x0 = xs[s]
        xcid = sl(miss_idx, x0, p_x)
        vx = (jnp.arange(p_x, dtype=i32) < x_cnt[s])[:, None]
        m_xc = lax.dynamic_slice_in_dim(m_c, x0, p_x, axis=0)
        d_t = idot(m_xc, cat3)                      # (p_x, 3P)
        locs = jnp.clip(xcid - s0, 0, S - 1)
        dz = jnp.where(vx & (xcid >= s0)[:, None]
                       & (xcid < s0 + S)[:, None], d_t, 0.0)
        d_full = jnp.zeros((S, 3 * p_band), jnp.float32).at[locs].add(dz)

        contam_x = ~cln_x
        P = p_band
        dots_x = {"sgg": a_t[:, :P], "sgm": a_t[:, P:2 * P],
                  "sgh": a_t[:, 2 * P:],
                  "shg": b_t[:, :P], "shm": b_t[:, P:2 * P],
                  "smg": d_full[:, :P],
                  "smm": jnp.where(contam_x, d_full[:, P:2 * P], pad_const),
                  "smh": d_full[:, 2 * P:]}
        rAx, rDax, rDbx = corr_from_dots(dots_x, sc_x, sc_c, n, n_padf,
                                         has_missing=True, symmetric=True)
        rA0, rDa0, rDb0 = corr_from_dots(dots_x, sc_x, sc_c, n, n_padf,
                                         has_missing=False, symmetric=True)
        d_add = adj(rAx) - adj(rA0)
        aDax, aDa0 = adj(rDax), adj(rDa0)
        aDbx, aDb0 = adj(rDbx), adj(rDb0)

        in_win = (cidx[None, :] >= lo_x) & (cidx[None, :] <= hi_x)
        pair = (in_win & usable_cc & usable_x & vc & xvalid
                & (cidx[None, :] != xidx[:, None]))
        dmA = pair & dom_ok_cc
        mirror = pair & cln_x
        dmB = mirror & dom_ok_x

        l2_f = credit(l2_f, s0, jnp.sum(d_add * pair, axis=1))
        l2d_f = credit(l2d_f, s0, jnp.sum((aDax - aDa0) * dmA, axis=1))
        wse_f = credit(
            wse_f, s0,
            jnp.sum(jnp.where(dmA, (aDax > rsq_thr).astype(i32)
                              - (aDa0 > rsq_thr).astype(i32), 0), axis=1))
        l2_cf = credit(l2_cf, c0, jnp.sum(d_add * mirror, axis=0))
        l2d_cf = credit(l2d_cf, c0, jnp.sum((aDbx - aDb0) * dmB, axis=0))
        wse_cf = credit(
            wse_cf, c0,
            jnp.sum(jnp.where(dmB, (aDbx > rsq_thr).astype(i32)
                              - (aDb0 > rsq_thr).astype(i32), 0), axis=0))
        return (l2_f, l2d_f, wse_f, l2_cf, l2d_cf, wse_cf), None

    mm_pad = miss_idx.shape[0]
    zf = jnp.zeros(m_pad, jnp.float32)
    zi = jnp.zeros(m_pad, i32)
    init = (zf, zf, zi, jnp.zeros(mm_pad, jnp.float32),
            jnp.zeros(mm_pad, jnp.float32), jnp.zeros(mm_pad, i32))
    (l2_f, l2d_f, wse_f, l2_cf, l2d_cf, wse_cf), _ = lax.scan(
        step, init, jnp.arange(n_segs, dtype=i32))
    l2_f = l2_f.at[miss_idx].add(l2_cf)
    l2d_f = l2d_f.at[miss_idx].add(l2d_cf)
    wse_f = wse_f.at[miss_idx].add(wse_cf)
    return l2_f, l2d_f, wse_f
