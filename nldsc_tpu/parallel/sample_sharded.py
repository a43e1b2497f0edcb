"""Sample-axis (N) sharding — the "sequence parallel" dimension.

For UKB-scale N the genotype block row (N samples) can outgrow one chip's
HBM even with SNP streaming.  Here the SAMPLE axis is scattered over the
mesh instead: every device holds all SNP rows but only its sample columns,
and every dot product in the integer algebra is a sum over samples — so

  * per-SNP moments (counts, sums, second moments) are shard-partial sums
    combined with one ``psum`` (exact: integer partials);
  * each banded tile's S-matrices are shard-partial integer matmuls
    combined with a per-tile ``psum`` before the fused epilogue;
  * the epilogue is replicated (cheap VPU work) and outputs are identical
    on every shard — deterministic by construction.

Composes conceptually with SNP-axis sharding/streaming (2-D mesh) — that
combination is future work (TODO.md).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..ld.ld_xla import _tile_epilogue, finalize_outputs
from ..ld.ld_int8 import make_idot
from .mesh import SNP_AXIS


def _sample_shard_fn(g, pos_ok, lo, hi, blk_lo, blk_hi, *, maf_thr, std_thr,
                     rsq_thr, n_samples, n_pad_total, block_size, band_k,
                     m_pad, has_missing, dot_dtype):
    """Per-shard body: g is (M_pad, N_pad/d) int8; everything else replicated."""
    B = block_size
    idot = make_idot(dot_dtype)
    n = jnp.float32(n_samples)
    n_padf = jnp.float32(n_pad_total)
    pad_miss = jnp.float32(n_pad_total - n_samples)

    # ---- per-SNP moments: shard-partial integer sums -> one psum ----
    valid = g >= 0
    gq = jnp.where(valid, g, 0).astype(jnp.int8)
    mq = (~valid).astype(jnp.int8)
    hq = jnp.where(valid, 2 * jnp.minimum(g, 1), 0).astype(jnp.int8)
    gf = gq.astype(jnp.float32)
    hf = hq.astype(jnp.float32)

    partial = jnp.stack([
        jnp.sum(valid, axis=1).astype(jnp.float32),   # n_valid
        jnp.sum(gf, axis=1),                           # add_sum
        jnp.sum(hf, axis=1),                           # dom_sum
        jnp.sum(gf * gf, axis=1),                      # sgg
        jnp.sum(gf * hf, axis=1),                      # sgh
        jnp.sum(hf * hf, axis=1),                      # shh
    ], axis=0)
    tot = lax.psum(partial, SNP_AXIS)
    n_valid_raw, add_sum, dom_sum, sgg_m, sgh_m, shh_m = tot

    all_missing = n_valid_raw == 0
    n_valid = jnp.maximum(n_valid_raw, 1.0)
    am = add_sum / n_valid
    dm = dom_sum / n_valid
    f2 = am * 0.5
    maf = jnp.minimum(f2, 1.0 - f2)
    usable = pos_ok & ((maf > maf_thr) | all_missing)

    n_miss = n - n_valid + pad_miss
    var_a = sgg_m + am * am * n_miss - n_padf * am * am
    cov_ad = sgh_m + am * dm * n_miss - n_padf * am * dm
    var_d = shh_m + dm * dm * n_miss - n_padf * dm * dm
    add_sd = jnp.sqrt(jnp.maximum(var_a, 0.0) / n)
    add_sd_zero = usable & ((var_a <= 0.0) | all_missing)
    safe = jnp.where(var_a > 0, var_a, 1.0)
    slope = cov_ad / safe
    rvar = var_d - slope * cov_ad
    rstd = jnp.sqrt(jnp.maximum(rvar, 0.0) / n)
    inv_sd = jnp.where((add_sd > 0) & usable,
                       1.0 / jnp.where(add_sd > 0, add_sd, 1.0), 0.0)
    inv_rstd = jnp.where((rstd > 0) & usable & ~add_sd_zero,
                         1.0 / jnp.where(rstd > 0, rstd, 1.0), 0.0)
    dom_ok = usable & (rstd > jnp.float32(std_thr)) & ~add_sd_zero
    nan = jnp.float32(jnp.nan)
    maf_out = jnp.where(pos_ok & ~all_missing, maf, nan)
    rstd_out = jnp.where(usable & ~add_sd_zero, rstd, nan)

    # ---- banded pass: partial S tiles, psum per tile pair ----
    band_rows = min(band_k * B, m_pad)

    def pivot_block(b):
        r0 = b * B
        gi_rows = lax.dynamic_slice_in_dim(gq, r0, B, axis=0)
        mi_rows = lax.dynamic_slice_in_dim(mq, r0, B, axis=0)
        gi = r0 + jnp.arange(B, dtype=jnp.int32)
        lo_i = lax.dynamic_slice_in_dim(lo, r0, B)
        hi_i = lax.dynamic_slice_in_dim(hi, r0, B)
        usable_i = lax.dynamic_slice_in_dim(usable, r0, B)
        am_i = lax.dynamic_slice_in_dim(am, r0, B)[:, None]
        inv_sd_i = lax.dynamic_slice_in_dim(inv_sd, r0, B)[:, None]

        j0 = jnp.clip(blk_lo[b] * B, 0, m_pad - band_rows)
        gj_rows = lax.dynamic_slice_in_dim(gq, j0, band_rows, axis=0)
        mj_rows = lax.dynamic_slice_in_dim(mq, j0, band_rows, axis=0)
        hj_rows = lax.dynamic_slice_in_dim(hq, j0, band_rows, axis=0)
        gj = j0 + jnp.arange(band_rows, dtype=jnp.int32)
        usable_j = lax.dynamic_slice_in_dim(usable, j0, band_rows)
        dom_ok_j = lax.dynamic_slice_in_dim(dom_ok, j0, band_rows)
        poison_j = lax.dynamic_slice_in_dim(add_sd_zero, j0, band_rows)
        am_j = lax.dynamic_slice_in_dim(am, j0, band_rows)[None, :]
        dm_j = lax.dynamic_slice_in_dim(dm, j0, band_rows)[None, :]
        slope_j = lax.dynamic_slice_in_dim(slope, j0, band_rows)[None, :]
        inv_sd_j = lax.dynamic_slice_in_dim(inv_sd, j0, band_rows)[None, :]
        inv_rstd_j = lax.dynamic_slice_in_dim(inv_rstd, j0,
                                              band_rows)[None, :]

        # shard-partial integer matmuls, combined exactly with psum
        tiles = [idot(gi_rows, gj_rows), idot(gi_rows, hj_rows)]
        if has_missing:
            tiles += [idot(gi_rows, mj_rows), idot(mi_rows, gj_rows),
                      idot(mi_rows, mj_rows), idot(mi_rows, hj_rows)]
        tiles = lax.psum(jnp.stack(tiles), SNP_AXIS)
        if has_missing:
            sgg, sgh, sgm, smg, smm, smh = tiles
            a_dot = sgg + am_j * sgm + am_i * smg + am_i * am_j * smm
            d_dot = sgh + dm_j * sgm + am_i * smh + am_i * dm_j * smm
        else:
            sgg, sgh = tiles
            a_dot = sgg + am_i * am_j * pad_miss
            d_dot = sgh + am_i * dm_j * pad_miss

        ac = a_dot - n_padf * am_i * am_j
        dc = d_dot - n_padf * am_i * dm_j
        r_add = ac * inv_sd_i * inv_sd_j / n
        r_dom = (dc - slope_j * ac) * inv_sd_i * inv_rstd_j / n
        return _tile_epilogue(r_add * n, r_dom * n, gi, gj, lo_i, hi_i,
                              usable_i, usable_j, dom_ok_j, poison_j,
                              n_samples, rsq_thr)

    accs = lax.map(pivot_block, jnp.arange(m_pad // B, dtype=jnp.int32))
    flat = tuple(a.reshape(m_pad) for a in accs)
    return flat + (usable, add_sd_zero, maf_out, rstd_out)


@partial(jax.jit,
         static_argnames=("maf_thr", "std_thr", "rsq_thr", "n_samples",
                          "n_pad_total", "block_size", "band_k", "mesh",
                          "has_missing", "dot_dtype"))
def _sample_sharded_call(g, pos_ok, lo, hi, blk_lo, blk_hi, *, maf_thr,
                         std_thr, rsq_thr, n_samples, n_pad_total,
                         block_size, band_k, mesh, has_missing, dot_dtype):
    fn = partial(_sample_shard_fn, maf_thr=maf_thr, std_thr=std_thr,
                 rsq_thr=jnp.float32(rsq_thr), n_samples=n_samples,
                 n_pad_total=n_pad_total, block_size=block_size,
                 band_k=band_k, m_pad=g.shape[0], has_missing=has_missing,
                 dot_dtype=dot_dtype)
    out = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, SNP_AXIS), P(), P(), P(), P(), P()),
        out_specs=tuple([P()] * 10),
    )(g, pos_ok, lo, hi, blk_lo, blk_hi)
    l2_acc, l2d_acc, ws, wsd, wse, poi, usable, add_sd_zero, maf, rstd = out
    fin = finalize_outputs(l2_acc, l2d_acc, ws, wsd, wse, poi, usable,
                           add_sd_zero)
    return fin + (maf, rstd)


def ld_scores_sample_sharded(genotypes: np.ndarray, positions: np.ndarray,
                             config, mesh) -> dict:
    """In-core LD scores with the SAMPLE axis scattered over ``mesh``."""
    from ..ld import windows  # noqa: PLC0415
    from ..ld.pipeline import to_host_result  # noqa: PLC0415

    m, n = genotypes.shape
    B = config.block_size
    d = mesh.devices.size
    m_pad = -(-m // B) * B
    col_chunk = 128 * d
    n_pad = -(-n // col_chunk) * col_chunk

    lo, hi, pos_ok = windows.window_bounds(positions, config.ld_wind)
    blk_lo, blk_hi, band_k = windows.band_blocks(lo, hi, B, m_pad // B)
    lo_pad = np.concatenate([lo, np.full(m_pad - m, m_pad, np.int32)]).astype(np.int32)
    hi_pad = np.concatenate([hi, np.full(m_pad - m, -1, np.int32)]).astype(np.int32)
    pos_ok_pad = np.concatenate([pos_ok, np.zeros(m_pad - m, bool)])

    g = np.full((m_pad, n_pad), -1, dtype=np.int8)
    g[:m, :n] = genotypes
    has_missing = bool((genotypes < 0).any())

    with mesh:
        outs = _sample_sharded_call(
            jnp.asarray(g), jnp.asarray(pos_ok_pad), jnp.asarray(lo_pad),
            jnp.asarray(hi_pad), jnp.asarray(blk_lo), jnp.asarray(blk_hi),
            maf_thr=float(config.maf_thr), std_thr=float(config.std_thr),
            rsq_thr=float(config.rsq_thr), n_samples=n, n_pad_total=n_pad,
            block_size=B, band_k=band_k, mesh=mesh,
            has_missing=has_missing, dot_dtype=config.int8_dot_dtype)

    l2, l2d, ws, wsd, wse, maf, rstd = outs
    return to_host_result(l2, l2d, ws, wsd, wse, maf, rstd, m)
