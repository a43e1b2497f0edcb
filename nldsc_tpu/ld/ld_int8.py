"""Integer-exact banded LD engine (int8 MXU path).

Genotypes are small integers, so every pairwise dot product the LD pass
needs is expressible through *integer* matmuls plus rank-1 analytic
corrections — no f32 rounding inside the contraction at all:

With ``g`` = additive codes (0 at missing/padding), ``m`` = missing
indicator, ``h`` = dominance codes (0 at missing), and per-SNP scalars
``am`` (additive mean), ``dm`` (dominance mean), ``slope`` (dominance OLS
slope), ``sd`` (additive pop-sd), ``rstd`` (residual pop-sd):

  a_imp = g + am·m                    (mean imputation, incl. padding)
  dot(a_imp_i, a_imp_j) = Sgg + am_j·Sgm + am_i·Smg + am_i·am_j·Smm
  centered:  ac_ij = that − n_pad·am_i·am_j
  r_add = ac_ij / (n · sd_i · sd_j)

  d_imp = h + dm·m
  dot(a_imp_i, d_imp_j) = Sgh + dm_j·Sgm + am_i·Smh + am_i·dm_j·Smm
  centered:  dc_ij = that − n_pad·am_i·dm_j
  dot(a_c_i, r_c_j) = dc_ij − slope_j · ac_ij
  r_dom = that / (n · sd_i · rstd_j)

where ``S**`` are int8×int8→int32 matmuls (Sgg, Sgm, Smg, Smm, Sgh, Smh).
Values are exact: |dot| ≤ 4·n_pad < 2^31.  When the dataset has no missing
genotypes (and no sample padding), the four ``m`` terms vanish and only
Sgg/Sgh remain — 2 integer matmuls instead of 2 f32 matmuls.

Accuracy: the only roundings are the per-SNP scalar corrections (f32),
giving ~1e-7 relative error — *tighter* than the reference's fp32 sdot.
Speed: int8 MXU throughput is several-fold the f32 multi-pass rate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .ld_xla import finalize_outputs


@partial(jax.jit, static_argnames=("n_samples", "assume_no_missing"))
def preprocess_int8(genotypes: jax.Array, pos_ok: jax.Array, maf_thr: jax.Array,
                    n_samples: int,
                    assume_no_missing: bool = False) -> dict[str, jax.Array]:
    """Integer-path preprocessing: keep int8 arrays + per-SNP f32 scalars.

    Same statistics contract as :func:`preprocess.preprocess_block` but
    returns ``g``/``m``/``h`` int8 matrices instead of standardized f32
    rows.  Sample padding must be negative (treated as missing) — UNLESS
    ``assume_no_missing`` is set, in which case the caller guarantees no
    negative codes anywhere (zero-pad rows/columns instead): ``g`` is
    returned as-is (no masked copy) and the missing-indicator slot aliases
    ``g`` (it is never read by the no-missing kernel branches), removing
    two of the three O(M·N) int8 materializations.  The correction
    algebra is invariant: with zero padding and no missing,
    ``sgg − n·am_i·am_j`` ≡ ``sgg + am_i·am_j·pad_miss − n_pad·am_i·am_j``.
    """
    g = genotypes
    n = jnp.float32(n_samples)

    if assume_no_missing:
        gq = g
        mq = g                      # alias; dead in no-missing kernels
        hq = (2 * jnp.minimum(g, 1)).astype(jnp.int8)
        cm = jnp.full(g.shape[0], jnp.float32(g.shape[1] - n_samples))
    else:
        valid = g >= 0
        gq = jnp.where(valid, g, 0).astype(jnp.int8)
        mq = (~valid).astype(jnp.int8)
        hq = jnp.where(valid, 2 * jnp.minimum(g, 1), 0).astype(jnp.int8)
        cm = jnp.sum(~valid, axis=1, dtype=jnp.float32)  # incl padding

    # every per-row moment is a closed form of THREE counts over the int8
    # codes (one fused read of g instead of five f32 passes):
    #   Σg = c1 + 2c2;  Σg² = c1 + 4c2;  h = 2·min(g,1):
    #   Σh = Σgh/… = 2(c1+c2);  Σh² = 4(c1+c2);  Σgh = 2c1 + 4c2
    c1 = jnp.sum(gq == 1, axis=1, dtype=jnp.float32)
    c2 = jnp.sum(gq == 2, axis=1, dtype=jnp.float32)

    n_valid_raw = jnp.float32(g.shape[1]) - cm
    # reference semantics for an ALL-missing SNP: NaN mean -> the MAF drop
    # test is false -> stays usable as an additive-sum poison (see
    # preprocess.preprocess_block)
    all_missing = n_valid_raw == 0
    n_valid = jnp.maximum(n_valid_raw, 1.0)
    add_sum = c1 + 2.0 * c2
    dom_sum = 2.0 * (c1 + c2)
    am = add_sum / n_valid
    dm = dom_sum / n_valid

    f2 = am * 0.5
    maf = jnp.minimum(f2, 1.0 - f2)
    usable = pos_ok & ((maf > maf_thr) | all_missing)

    # population moments of the imputed vectors via the same decomposition
    # (exact integer second moments + rank-1 corrections)
    sgg = c1 + 4.0 * c2                                 # dot(g, g), exact
    sgh = 2.0 * c1 + 4.0 * c2                           # dot(g, h), exact
    n_miss = cm                                          # incl padding
    n_pad = jnp.float32(g.shape[1])
    # dot(a_imp, a_imp) = sgg + am^2 * n_missing_total
    var_a_sum = sgg + am * am * n_miss - n_pad * am * am
    cov_ad_sum = sgh + am * dm * n_miss - n_pad * am * dm

    add_sd = jnp.sqrt(jnp.maximum(var_a_sum, 0.0) / n)
    add_sd_zero = usable & ((var_a_sum <= 0.0) | all_missing)
    safe_var = jnp.where(var_a_sum > 0, var_a_sum, 1.0)
    slope = cov_ad_sum / safe_var

    # residual variance: var(d) - slope * cov(a, d)  (1-D OLS identity)
    shh = 4.0 * (c1 + c2)
    var_d_sum = shh + dm * dm * n_miss - n_pad * dm * dm
    rvar_sum = var_d_sum - slope * cov_ad_sum
    rstd = jnp.sqrt(jnp.maximum(rvar_sum, 0.0) / n)

    inv_sd = jnp.where((add_sd > 0) & usable, 1.0 / jnp.where(add_sd > 0, add_sd, 1.0), 0.0)
    inv_rstd = jnp.where((rstd > 0) & usable & ~add_sd_zero,
                         1.0 / jnp.where(rstd > 0, rstd, 1.0), 0.0)

    nan = jnp.float32(jnp.nan)
    return {
        "g": gq, "m": mq, "h": hq,
        "am": am, "dm": dm, "slope": slope,
        "inv_sd": inv_sd, "inv_rstd": inv_rstd,
        "maf": jnp.where(pos_ok & ~all_missing, maf, nan),
        "rstd": jnp.where(usable & ~add_sd_zero, rstd, nan),
        "usable": usable, "add_sd_zero": add_sd_zero,
        "has_missing": (jnp.array(False) if assume_no_missing
                        else jnp.any(mq > 0)),
    }


def make_idot(dot_dtype: str):
    """Contraction primitive: int8 MXU or exact-bf16 single-pass."""
    dims = (((1,), (1,)), ((), ()))
    if dot_dtype == "int8":
        def idot(x, y):
            return lax.dot_general(
                x, y, dims,
                preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        def idot(x, y):
            return lax.dot_general(
                x.astype(jnp.bfloat16), y.astype(jnp.bfloat16), dims,
                preferred_element_type=jnp.float32)
    return idot


def integer_corr_tiles(idot, gi_rows, mi_rows, gj_rows, mj_rows, hj_rows,
                       am_i, am_j, dm_j, slope_j, inv_sd_i, inv_sd_j,
                       inv_rstd_j, n, n_padf, pad_miss, has_missing: bool):
    """(r_add, r_dom) correlation tiles from integer matmuls + corrections.

    Row operands are the pivot rows, column operands the neighbor band;
    shapes: gi (B, Np), gj/mj/hj (W, Np); scalars broadcast (B,1)/(1,W).
    """
    sgg = idot(gi_rows, gj_rows)
    sgh = idot(gi_rows, hj_rows)
    if has_missing:
        sgm = idot(gi_rows, mj_rows)
        smg = idot(mi_rows, gj_rows)
        smm = idot(mi_rows, mj_rows)
        smh = idot(mi_rows, hj_rows)
        a_dot = sgg + am_j * sgm + am_i * smg + am_i * am_j * smm
        d_dot = sgh + dm_j * sgm + am_i * smh + am_i * dm_j * smm
    else:
        a_dot = sgg + am_i * am_j * pad_miss
        d_dot = sgh + am_i * dm_j * pad_miss
    ac = a_dot - n_padf * am_i * am_j
    dc = d_dot - n_padf * am_i * dm_j
    r_add = ac * inv_sd_i * inv_sd_j / n
    r_dom = (dc - slope_j * ac) * inv_sd_i * inv_rstd_j / n
    return r_add, r_dom


@partial(jax.jit, static_argnames=("block_size", "band_k", "n_samples",
                                   "has_missing", "dot_dtype"))
def ld_scores_int8(g, m, h, am, dm, slope, inv_sd, inv_rstd, lo, hi, usable,
                   dom_ok, add_sd_zero, blk_lo, blk_hi, rsq_thr, *,
                   block_size: int, band_k: int, n_samples: int,
                   has_missing: bool, dot_dtype: str = "int8"):
    """Banded LD pass on integer matmuls (same contract as ld_scores_xla).

    ``dot_dtype``: 'int8' (int8×int8→int32 MXU) or 'bf16'
    (bf16×bf16→f32 at single-pass rate).  BOTH are exact here: genotype
    codes {0,1,2} are exactly representable in bf16 and every partial sum
    is an integer below 2^24, so f32 accumulation never rounds (valid for
    N_pad ≤ 4M samples).
    """
    m_pad, n_pad_cols = g.shape
    assert n_pad_cols <= (1 << 22), "bf16-exact path requires N_pad <= 4M"
    n_blocks = m_pad // block_size
    B = block_size
    band_rows = min(band_k * B, m_pad)
    n = jnp.float32(n_samples)
    n_padf = jnp.float32(n_pad_cols)
    pad_miss = jnp.float32(n_pad_cols - n_samples)
    adj_c = (n - 1.0) / (n - 2.0)
    idot = make_idot(dot_dtype)

    def pivot_block(b):
        r0 = b * B
        gi_rows = lax.dynamic_slice_in_dim(g, r0, B, axis=0)
        mi_rows = lax.dynamic_slice_in_dim(m, r0, B, axis=0)
        gi = r0 + jnp.arange(B, dtype=jnp.int32)
        lo_i = lax.dynamic_slice_in_dim(lo, r0, B)
        hi_i = lax.dynamic_slice_in_dim(hi, r0, B)
        usable_i = lax.dynamic_slice_in_dim(usable, r0, B)
        am_i = lax.dynamic_slice_in_dim(am, r0, B)[:, None]
        inv_sd_i = lax.dynamic_slice_in_dim(inv_sd, r0, B)[:, None]

        j0 = jnp.clip(blk_lo[b] * B, 0, m_pad - band_rows)
        gj_rows = lax.dynamic_slice_in_dim(g, j0, band_rows, axis=0)
        mj_rows = lax.dynamic_slice_in_dim(m, j0, band_rows, axis=0)
        hj_rows = lax.dynamic_slice_in_dim(h, j0, band_rows, axis=0)
        gj = j0 + jnp.arange(band_rows, dtype=jnp.int32)
        usable_j = lax.dynamic_slice_in_dim(usable, j0, band_rows)
        dom_ok_j = lax.dynamic_slice_in_dim(dom_ok, j0, band_rows)
        poison_j = lax.dynamic_slice_in_dim(add_sd_zero, j0, band_rows)
        am_j = lax.dynamic_slice_in_dim(am, j0, band_rows)[None, :]
        dm_j = lax.dynamic_slice_in_dim(dm, j0, band_rows)[None, :]
        slope_j = lax.dynamic_slice_in_dim(slope, j0, band_rows)[None, :]
        inv_sd_j = lax.dynamic_slice_in_dim(inv_sd, j0, band_rows)[None, :]
        inv_rstd_j = lax.dynamic_slice_in_dim(inv_rstd, j0, band_rows)[None, :]

        # no real missing: m is nonzero only on sample-padding columns,
        # where g/h are zero — Sgm = Smg = Smh = 0 and Smm is the constant
        # pad width, so the corrections collapse analytically
        r_add, r_dom = integer_corr_tiles(
            idot, gi_rows, mi_rows, gj_rows, mj_rows, hj_rows,
            am_i, am_j, dm_j, slope_j, inv_sd_i, inv_sd_j, inv_rstd_j,
            n, n_padf, pad_miss, has_missing)

        adj_add = 1.0 - (1.0 - r_add * r_add) * adj_c
        adj_dom = 1.0 - (1.0 - r_dom * r_dom) * adj_c

        valid_k = gj <= blk_hi[b] * B + (B - 1)
        in_win = ((gj[None, :] >= lo_i[:, None]) &
                  (gj[None, :] <= hi_i[:, None]) & valid_k[None, :])
        pair = in_win & usable_j[None, :] & usable_i[:, None]
        base = pair & (gj[None, :] != gi[:, None])
        dmask = base & dom_ok_j[None, :]
        basef = base.astype(jnp.float32)
        dmaskf = dmask.astype(jnp.float32)

        l2_p = jnp.sum(adj_add * basef, axis=1)
        l2d_p = jnp.sum(adj_dom * dmaskf, axis=1)
        ws_p = jnp.sum(base, axis=1).astype(jnp.int32)
        wsd_p = jnp.sum(dmask, axis=1).astype(jnp.int32)
        wse_p = jnp.sum((adj_dom > rsq_thr) & dmask, axis=1).astype(jnp.int32)
        poi_p = jnp.sum(pair & poison_j[None, :], axis=1).astype(jnp.int32)
        return l2_p, l2d_p, ws_p, wsd_p, wse_p, poi_p

    accs = lax.map(pivot_block, jnp.arange(n_blocks, dtype=jnp.int32))
    l2_acc, l2d_acc, ws, wsd, wse, poison = (a.reshape(m_pad) for a in accs)
    return finalize_outputs(l2_acc, l2d_acc, ws, wsd, wse, poison,
                            usable, add_sd_zero)


@partial(jax.jit, static_argnames=("block_size", "right_k", "n_samples",
                                   "has_missing", "dot_dtype"))
def ld_scores_int8_sym2(g, m, h, am, dm, slope, inv_sd, inv_rstd, lo, hi,
                        usable, dom_ok, add_sd_zero, blk_lo, blk_hi, rsq_thr,
                        *, block_size: int, right_k: int, n_samples: int,
                        has_missing: bool, dot_dtype: str = "int8"):
    """Two-pass symmetry-exploiting integer engine (no scan carry).

    Same pair algebra as :func:`ld_scores_int8_sym` (right half-band,
    bidirectional credit) but restructured to avoid the sequential
    ``lax.scan`` + full-length scatter carry that serializes that engine:

      pass 1 — ``lax.map`` over pivot blocks, each returning its ROW sums
               (B,) and its COLUMN-credit vectors (right_rows,) for the
               mirrored pairs; iterations carry nothing;
      pass 2 — one batched scatter-add folds all column-credit vectors at
               their block offsets (O(n_blocks · right_rows) VPU work).

    Matmul flops match the one-pass symmetric engine: 3 half-band integer
    matmuls per tile without missing data, 8 with.
    """
    m_pad, n_pad_cols = g.shape
    assert n_pad_cols <= (1 << 22)
    n_blocks = m_pad // block_size
    B = block_size
    right_rows = min(right_k * B, m_pad)
    n = jnp.float32(n_samples)
    n_padf = jnp.float32(n_pad_cols)
    adj_c = (n - 1.0) / (n - 2.0)
    idot = make_idot(dot_dtype)

    def sl(v, at, size):
        return lax.dynamic_slice_in_dim(v, at, size)

    def pivot_block(b):
        r0 = b * B
        gi = r0 + jnp.arange(B, dtype=jnp.int32)
        g_i = lax.dynamic_slice_in_dim(g, r0, B, axis=0)
        m_i = lax.dynamic_slice_in_dim(m, r0, B, axis=0)
        h_i = lax.dynamic_slice_in_dim(h, r0, B, axis=0)
        lo_i = sl(lo, r0, B)[:, None]
        hi_i = sl(hi, r0, B)[:, None]
        usable_i = sl(usable, r0, B)[:, None]
        poison_i = sl(add_sd_zero, r0, B)[:, None]
        dom_ok_i = sl(dom_ok, r0, B)[:, None]
        am_i = sl(am, r0, B)[:, None]
        dm_i = sl(dm, r0, B)[:, None]
        slope_i = sl(slope, r0, B)[:, None]
        inv_sd_i = sl(inv_sd, r0, B)[:, None]
        inv_rstd_i = sl(inv_rstd, r0, B)[:, None]

        j0 = jnp.minimum(r0, m_pad - right_rows)
        gj = j0 + jnp.arange(right_rows, dtype=jnp.int32)
        g_j = lax.dynamic_slice_in_dim(g, j0, right_rows, axis=0)
        m_j = lax.dynamic_slice_in_dim(m, j0, right_rows, axis=0)
        h_j = lax.dynamic_slice_in_dim(h, j0, right_rows, axis=0)
        usable_j = sl(usable, j0, right_rows)[None, :]
        poison_j = sl(add_sd_zero, j0, right_rows)[None, :]
        dom_ok_j = sl(dom_ok, j0, right_rows)[None, :]
        am_j = sl(am, j0, right_rows)[None, :]
        dm_j = sl(dm, j0, right_rows)[None, :]
        slope_j = sl(slope, j0, right_rows)[None, :]
        inv_sd_j = sl(inv_sd, j0, right_rows)[None, :]
        inv_rstd_j = sl(inv_rstd, j0, right_rows)[None, :]

        sgg = idot(g_i, g_j)
        sgh = idot(g_i, h_j)
        shg = idot(h_i, g_j)
        if has_missing:
            sgm = idot(g_i, m_j)
            smg = idot(m_i, g_j)
            smm = idot(m_i, m_j)
            smh = idot(m_i, h_j)
            shm = idot(h_i, m_j)
            a_dot = sgg + am_j * sgm + am_i * smg + am_i * am_j * smm
            dA = sgh + dm_j * sgm + am_i * smh + am_i * dm_j * smm
            dB = shg + am_j * shm + dm_i * smg + dm_i * am_j * smm
        else:
            pad_miss = jnp.float32(n_pad_cols - n_samples)
            a_dot = sgg + am_i * am_j * pad_miss
            dA = sgh + am_i * dm_j * pad_miss
            dB = shg + dm_i * am_j * pad_miss

        ac = a_dot - n_padf * am_i * am_j
        dcA = dA - n_padf * am_i * dm_j
        dcB = dB - n_padf * dm_i * am_j
        r_add = ac * inv_sd_i * inv_sd_j / n
        r_domA = (dcA - slope_j * ac) * inv_sd_i * inv_rstd_j / n
        r_domB = (dcB - slope_i * ac) * inv_rstd_i * inv_sd_j / n

        adj_add = 1.0 - (1.0 - r_add * r_add) * adj_c
        adj_dA = 1.0 - (1.0 - r_domA * r_domA) * adj_c
        adj_dB = 1.0 - (1.0 - r_domB * r_domB) * adj_c

        in_win = (gj[None, :] >= lo_i) & (gj[None, :] <= hi_i)
        upair = in_win & usable_j & usable_i
        fwd = gj[None, :] >= r0
        row_base = upair & fwd & (gj[None, :] != gi[:, None])
        col_base = upair & (gj[None, :] >= r0 + B)
        dmA = row_base & dom_ok_j
        dmB = col_base & dom_ok_i
        rowf = row_base.astype(jnp.float32)
        colf = col_base.astype(jnp.float32)
        dmAf = dmA.astype(jnp.float32)
        dmBf = dmB.astype(jnp.float32)

        rows = (
            jnp.sum(adj_add * rowf, axis=1),
            jnp.sum(row_base, axis=1).astype(jnp.int32),
            jnp.sum(upair & fwd & poison_j, axis=1).astype(jnp.int32),
            jnp.sum(adj_dA * dmAf, axis=1),
            jnp.sum(dmA, axis=1).astype(jnp.int32),
            jnp.sum((adj_dA > rsq_thr) & dmA, axis=1).astype(jnp.int32),
        )
        cols = (
            jnp.sum(adj_add * colf, axis=0),
            jnp.sum(col_base, axis=0).astype(jnp.int32),
            jnp.sum(upair & poison_i & (gj[None, :] >= r0 + B),
                    axis=0).astype(jnp.int32),
            jnp.sum(adj_dB * dmBf, axis=0),
            jnp.sum(dmB, axis=0).astype(jnp.int32),
            jnp.sum((adj_dB > rsq_thr) & dmB, axis=0).astype(jnp.int32),
        )
        return rows + cols + (j0,)

    outs = lax.map(pivot_block, jnp.arange(n_blocks, dtype=jnp.int32))
    rows, cols, j0s = outs[:6], outs[6:12], outs[12]
    # pass 2: fold column credits at each block's (clamped) offset
    idx = j0s[:, None] + jnp.arange(right_rows, dtype=jnp.int32)[None, :]

    def fold(row_parts, col_parts):
        full = row_parts.reshape(m_pad).astype(col_parts.dtype)
        return full.at[idx.reshape(-1)].add(col_parts.reshape(-1))

    l2_acc, ws, poison, l2d_acc, wsd, wse = (
        fold(r, c) for r, c in zip(rows, cols))
    return finalize_outputs(l2_acc, l2d_acc, ws, wsd, wse, poison,
                            usable, add_sd_zero)


@partial(jax.jit, static_argnames=("block_size", "band_k", "right_k",
                                   "n_samples", "has_missing", "dot_dtype"))
def ld_scores_int8_sym(g, m, h, am, dm, slope, inv_sd, inv_rstd, lo, hi,
                       usable, dom_ok, add_sd_zero, blk_lo, blk_hi, rsq_thr,
                       *, block_size: int, band_k: int, right_k: int,
                       n_samples: int, has_missing: bool,
                       dot_dtype: str = "int8"):
    """Symmetry-exploiting integer engine.

    Each pivot block multiplies only its RIGHT half-band; one tile yields
    *both* directions of every pair:

      additive     — ``ac`` is symmetric: row sums credit the pivot rows,
                     column sums credit the mirrored pairs;
      dominance A  — (pivot-row additive) × (col residual) from ``Sgh``;
      dominance B  — (col additive) × (row residual) from ``Shg`` and the
                     transposed corrections, using ``ac_ji = ac_ij``.

    Half-band matmuls: 3 (Sgg, Sgh, Shg) without missing, 8 with — vs the
    full-band engine's 2 / 6 — a 4/3 (resp. 3/2) flop reduction.
    Intra-block pairs are fully covered by row-direction sums (both orders
    appear inside the tile); column-direction sums skip the intra tile.
    """
    m_pad, n_pad_cols = g.shape
    assert n_pad_cols <= (1 << 22)
    n_blocks = m_pad // block_size
    B = block_size
    right_rows = min(right_k * B, m_pad)
    n = jnp.float32(n_samples)
    n_padf = jnp.float32(n_pad_cols)
    adj_c = (n - 1.0) / (n - 2.0)
    idot = make_idot(dot_dtype)

    def sl(v, at, size):
        return lax.dynamic_slice_in_dim(v, at, size)

    def step(carry, b):
        (l2_f, ws_f, poi_f, l2d_f, wsd_f, wse_f) = carry
        r0 = b * B
        gi = r0 + jnp.arange(B, dtype=jnp.int32)
        g_i = lax.dynamic_slice_in_dim(g, r0, B, axis=0)
        m_i = lax.dynamic_slice_in_dim(m, r0, B, axis=0)
        h_i = lax.dynamic_slice_in_dim(h, r0, B, axis=0)
        lo_i = sl(lo, r0, B)[:, None]
        hi_i = sl(hi, r0, B)[:, None]
        usable_i = sl(usable, r0, B)[:, None]
        poison_i = sl(add_sd_zero, r0, B)[:, None]
        dom_ok_i = sl(dom_ok, r0, B)[:, None]
        am_i = sl(am, r0, B)[:, None]
        dm_i = sl(dm, r0, B)[:, None]
        slope_i = sl(slope, r0, B)[:, None]
        inv_sd_i = sl(inv_sd, r0, B)[:, None]
        inv_rstd_i = sl(inv_rstd, r0, B)[:, None]

        j0 = jnp.minimum(r0, m_pad - right_rows)
        gj = j0 + jnp.arange(right_rows, dtype=jnp.int32)
        g_j = lax.dynamic_slice_in_dim(g, j0, right_rows, axis=0)
        m_j = lax.dynamic_slice_in_dim(m, j0, right_rows, axis=0)
        h_j = lax.dynamic_slice_in_dim(h, j0, right_rows, axis=0)
        usable_j = sl(usable, j0, right_rows)[None, :]
        poison_j = sl(add_sd_zero, j0, right_rows)[None, :]
        dom_ok_j = sl(dom_ok, j0, right_rows)[None, :]
        am_j = sl(am, j0, right_rows)[None, :]
        dm_j = sl(dm, j0, right_rows)[None, :]
        slope_j = sl(slope, j0, right_rows)[None, :]
        inv_sd_j = sl(inv_sd, j0, right_rows)[None, :]
        inv_rstd_j = sl(inv_rstd, j0, right_rows)[None, :]

        sgg = idot(g_i, g_j)
        sgh = idot(g_i, h_j)
        shg = idot(h_i, g_j)
        if has_missing:
            sgm = idot(g_i, m_j)
            smg = idot(m_i, g_j)
            smm = idot(m_i, m_j)
            smh = idot(m_i, h_j)
            shm = idot(h_i, m_j)
            a_dot = sgg + am_j * sgm + am_i * smg + am_i * am_j * smm
            dA = sgh + dm_j * sgm + am_i * smh + am_i * dm_j * smm
            dB = shg + am_j * shm + dm_i * smg + dm_i * am_j * smm
        else:
            pad_miss = jnp.float32(n_pad_cols - n_samples)
            a_dot = sgg + am_i * am_j * pad_miss
            dA = sgh + am_i * dm_j * pad_miss
            dB = shg + dm_i * am_j * pad_miss

        ac = a_dot - n_padf * am_i * am_j
        dcA = dA - n_padf * am_i * dm_j      # dot(a_c_i, d_c_j)
        dcB = dB - n_padf * dm_i * am_j      # dot(d_c_i, a_c_j) = dot(a_c_j, d_c_i)
        r_add = ac * inv_sd_i * inv_sd_j / n
        r_domA = (dcA - slope_j * ac) * inv_sd_i * inv_rstd_j / n
        r_domB = (dcB - slope_i * ac) * inv_rstd_i * inv_sd_j / n

        adj_add = 1.0 - (1.0 - r_add * r_add) * adj_c
        adj_dA = 1.0 - (1.0 - r_domA * r_domA) * adj_c
        adj_dB = 1.0 - (1.0 - r_domB * r_domB) * adj_c

        in_win = (gj[None, :] >= lo_i) & (gj[None, :] <= hi_i)
        upair = in_win & usable_j & usable_i
        fwd = gj[None, :] >= r0
        row_base = upair & fwd & (gj[None, :] != gi[:, None])
        col_base = upair & (gj[None, :] >= r0 + B)

        rowf = row_base.astype(jnp.float32)
        colf = col_base.astype(jnp.float32)
        dmA = row_base & dom_ok_j
        dmB = col_base & dom_ok_i
        dmAf = dmA.astype(jnp.float32)
        dmBf = dmB.astype(jnp.float32)

        def credit(full, at, vals):
            cur = lax.dynamic_slice_in_dim(full, at, vals.shape[0])
            return lax.dynamic_update_slice_in_dim(full, cur + vals, at, 0)

        l2_f = credit(credit(l2_f, r0, jnp.sum(adj_add * rowf, axis=1)),
                      j0, jnp.sum(adj_add * colf, axis=0))
        ws_f = credit(credit(ws_f, r0, jnp.sum(row_base, axis=1).astype(jnp.int32)),
                      j0, jnp.sum(col_base, axis=0).astype(jnp.int32))
        poi_f = credit(
            credit(poi_f, r0,
                   jnp.sum(upair & fwd & poison_j, axis=1).astype(jnp.int32)),
            j0, jnp.sum(upair & poison_i & (gj[None, :] >= r0 + B),
                        axis=0).astype(jnp.int32))

        l2d_f = credit(credit(l2d_f, r0, jnp.sum(adj_dA * dmAf, axis=1)),
                       j0, jnp.sum(adj_dB * dmBf, axis=0))
        wsd_f = credit(credit(wsd_f, r0, jnp.sum(dmA, axis=1).astype(jnp.int32)),
                       j0, jnp.sum(dmB, axis=0).astype(jnp.int32))
        wse_f = credit(
            credit(wse_f, r0,
                   jnp.sum((adj_dA > rsq_thr) & dmA, axis=1).astype(jnp.int32)),
            j0, jnp.sum((adj_dB > rsq_thr) & dmB, axis=0).astype(jnp.int32))

        return (l2_f, ws_f, poi_f, l2d_f, wsd_f, wse_f), None

    zf = jnp.zeros(m_pad, jnp.float32)
    zi = jnp.zeros(m_pad, jnp.int32)
    (l2_acc, ws, poison, l2d_acc, wsd, wse), _ = lax.scan(
        step, (zf, zi, zi, zf, zi, zi), jnp.arange(n_blocks, dtype=jnp.int32))
    return finalize_outputs(l2_acc, l2d_acc, ws, wsd, wse, poison,
                            usable, add_sd_zero)
