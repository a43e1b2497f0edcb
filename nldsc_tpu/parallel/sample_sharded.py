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
from ..ld.ld_int8 import (corr_from_dots, finish_preprocess_int8, make_idot,
                          scal_views, stack_scalars)
from .mesh import SNP_AXIS


def _sample_shard_fn(g, pos_ok, lo, hi, blk_lo, blk_hi, *, maf_thr, std_thr,
                     rsq_thr, n_samples, n_pad_total, block_size, band_k,
                     m_pad, has_missing, dot_dtype):
    """Per-shard body: g is (M_pad, N_pad/d) int8; everything else replicated."""
    B = block_size
    idot = make_idot(dot_dtype)
    n = jnp.float32(n_samples)
    n_padf = jnp.float32(n_pad_total)

    # ---- per-SNP class counts: shard-partial integer sums -> one psum ----
    valid = g >= 0
    gq = jnp.where(valid, g, 0).astype(jnp.int8)
    mq = (~valid).astype(jnp.int8)
    hq = jnp.where(valid, 2 * jnp.minimum(g, 1), 0).astype(jnp.int8)

    partial = jnp.stack([
        jnp.sum(valid, axis=1).astype(jnp.float32),       # n_valid
        jnp.sum(gq == 1, axis=1, dtype=jnp.float32),      # c1
        jnp.sum(gq == 2, axis=1, dtype=jnp.float32),      # c2
    ], axis=0)
    n_valid_raw, c1, c2 = lax.psum(partial, SNP_AXIS)

    pre = finish_preprocess_int8(n_valid_raw, c1, c2, n_padf - n_valid_raw,
                                 pos_ok, maf_thr, n_samples, n_pad_total)
    usable = pre["usable"]
    add_sd_zero = pre["add_sd_zero"]
    dom_ok = usable & (pre["rstd"] > jnp.float32(std_thr)) & ~add_sd_zero
    maf_out, rstd_out = pre["maf"], pre["rstd"]
    scal = stack_scalars(pre)

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
        sc_i = scal_views(lax.dynamic_slice_in_dim(scal, r0, B, axis=0), "col")

        j0 = jnp.clip(blk_lo[b] * B, 0, m_pad - band_rows)
        gj_rows = lax.dynamic_slice_in_dim(gq, j0, band_rows, axis=0)
        mj_rows = lax.dynamic_slice_in_dim(mq, j0, band_rows, axis=0)
        hj_rows = lax.dynamic_slice_in_dim(hq, j0, band_rows, axis=0)
        gj = j0 + jnp.arange(band_rows, dtype=jnp.int32)
        usable_j = lax.dynamic_slice_in_dim(usable, j0, band_rows)
        dom_ok_j = lax.dynamic_slice_in_dim(dom_ok, j0, band_rows)
        poison_j = lax.dynamic_slice_in_dim(add_sd_zero, j0, band_rows)
        sc_j = scal_views(lax.dynamic_slice_in_dim(scal, j0, band_rows,
                                                   axis=0), "row")

        # shard-partial integer matmuls, combined exactly with psum
        names = ["sgg", "sgh"]
        tiles = [idot(gi_rows, gj_rows), idot(gi_rows, hj_rows)]
        if has_missing:
            names += ["sgm", "smg", "smm", "smh"]
            tiles += [idot(gi_rows, mj_rows), idot(mi_rows, gj_rows),
                      idot(mi_rows, mj_rows), idot(mi_rows, hj_rows)]
        tiles = lax.psum(jnp.stack(tiles), SNP_AXIS)
        dots = dict(zip(names, tiles))
        r_add, r_dom = corr_from_dots(dots, sc_i, sc_j, n, n_padf,
                                      has_missing)
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
