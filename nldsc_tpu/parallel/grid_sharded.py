"""2-D (SNP × sample) sharded LD scores — the full pod-slice layout.

Composes the two 1-D strategies:

* rows (SNPs) are scattered over the ``snp`` mesh axis with multi-hop
  ``ppermute`` halo exchange of int8 codes (``sharded.py``);
* columns (samples) are scattered over the ``samp`` axis; per-SNP moments
  and per-tile S-matrices are shard-partial integer sums combined exactly
  with ``psum`` over ``samp`` (``sample_sharded.py``).

Every output row is owned by exactly one ``snp`` shard and is identical
across its ``samp`` row of the mesh — deterministic, collective-minimal
(one psum per moment pass + one per tile pair, halos ride ``ppermute``).

On a real pod slice, lay ``samp`` over the slower links and ``snp`` over
ICI neighbors: halo traffic is int8 and nearest-neighbor, psum traffic is
f32 tiles over the sample groups.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ld.ld_int8 import (corr_from_dots, finish_preprocess_int8, make_idot,
                          scal_views, stack_scalars)
from ..ld.ld_xla import _tile_epilogue, finalize_outputs

SNP_AXIS = "snp"
SAMP_AXIS = "samp"


def grid_mesh(n_snp_shards: int, n_samp_shards: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_snp_shards * n_samp_shards]
    arr = np.array(devices).reshape(n_snp_shards, n_samp_shards)
    return Mesh(arr, (SNP_AXIS, SAMP_AXIS))


def _extend_snp(x: jnp.ndarray, h: int) -> jnp.ndarray:
    """Halo-extend along the snp axis (multi-hop, zeros at edges)."""
    if h == 0:  # single snp-shard: x[-0:] would be the whole array
        return x
    n_shards = lax.axis_size(SNP_AXIS)
    L = x.shape[0]

    def perm(hop, direction):
        if direction > 0:
            return [(i, i + hop) for i in range(n_shards - hop)]
        return [(i + hop, i) for i in range(n_shards - hop)]

    if h <= L:
        fl = lax.ppermute(x[-h:], SNP_AXIS, perm(1, +1))
        fr = lax.ppermute(x[:h], SNP_AXIS, perm(1, -1))
    else:
        n_hops = -(-h // L)
        fl = jnp.concatenate(
            [lax.ppermute(x, SNP_AXIS, perm(k, +1))
             for k in range(n_hops, 0, -1)], axis=0)[-h:]
        fr = jnp.concatenate(
            [lax.ppermute(x, SNP_AXIS, perm(k, -1))
             for k in range(1, n_hops + 1)], axis=0)[:h]
    return jnp.concatenate([fl, x, fr], axis=0)


def _grid_shard_fn(g, pos_ok, lo, hi, blk_lo, blk_hi, annot=None, *,
                   maf_thr, std_thr, rsq_thr, n_samples, n_pad_total,
                   block_size, band_k, halo_rows, m_pad, has_missing,
                   dot_dtype):
    """g: (L, N_pad/d_samp) int8 local tile of the genotype matrix.

    ``annot``: optional f32 (L, p) annotation rows, sharded along the
    snp axis and replicated along samp; halo-extended like the codes and
    contracted after the per-tile psum (identical across a samp row)."""
    B = block_size
    L = g.shape[0]
    H = halo_rows
    shard = lax.axis_index(SNP_AXIS)
    shard_start = shard * L
    idot = make_idot(dot_dtype)
    n = jnp.float32(n_samples)
    n_padf = jnp.float32(n_pad_total)

    # ---- class counts: partial over local sample columns -> psum over samp ----
    valid = g >= 0
    gq = jnp.where(valid, g, 0).astype(jnp.int8)
    mq = (~valid).astype(jnp.int8)
    hq = jnp.where(valid, 2 * jnp.minimum(g, 1), 0).astype(jnp.int8)
    partial_counts = jnp.stack([
        jnp.sum(valid, axis=1).astype(jnp.float32),
        jnp.sum(gq == 1, axis=1, dtype=jnp.float32),
        jnp.sum(gq == 2, axis=1, dtype=jnp.float32),
    ], axis=0)
    n_valid_raw, c1, c2 = lax.psum(partial_counts, SAMP_AXIS)

    pre = finish_preprocess_int8(n_valid_raw, c1, c2, n_padf - n_valid_raw,
                                 pos_ok, maf_thr, n_samples, n_pad_total)
    usable = pre["usable"]
    add_sd_zero = pre["add_sd_zero"]
    dom_ok = usable & (pre["rstd"] > jnp.float32(std_thr)) & ~add_sd_zero
    maf_out, rstd_out = pre["maf"], pre["rstd"]
    scal = stack_scalars(pre)

    # ---- halo-extend codes (snp axis) + scalar row ----
    g_ext = _extend_snp(gq, H)
    m_ext = _extend_snp(mq, H)
    h_ext = _extend_snp(hq, H)
    scalars = jnp.concatenate([
        scal, jnp.stack([usable, dom_ok, add_sd_zero],
                        axis=1).astype(jnp.float32)], axis=1)
    scal_ext = _extend_snp(scalars, H)
    a_ext = None if annot is None else _extend_snp(annot, H)

    band_rows = min(band_k * B, L + 2 * H)
    ext_rows = L + 2 * H

    def pivot_block(b_local):
        gb = shard * (L // B) + b_local
        r0 = b_local * B
        gi_rows = lax.dynamic_slice_in_dim(g_ext, H + r0, B, axis=0)
        mi_rows = lax.dynamic_slice_in_dim(m_ext, H + r0, B, axis=0)
        gi = shard_start + r0 + jnp.arange(B, dtype=jnp.int32)
        lo_i = lax.dynamic_slice_in_dim(lo, shard_start + r0, B)
        hi_i = lax.dynamic_slice_in_dim(hi, shard_start + r0, B)
        usable_i = lax.dynamic_slice_in_dim(usable, r0, B)
        sc_i = scal_views(lax.dynamic_slice_in_dim(scal, r0, B, axis=0), "col")

        j0_ext = jnp.clip(blk_lo[gb] * B - (shard_start - H),
                          0, ext_rows - band_rows)
        gj_rows = lax.dynamic_slice_in_dim(g_ext, j0_ext, band_rows, axis=0)
        mj_rows = lax.dynamic_slice_in_dim(m_ext, j0_ext, band_rows, axis=0)
        hj_rows = lax.dynamic_slice_in_dim(h_ext, j0_ext, band_rows, axis=0)
        sc = lax.dynamic_slice_in_dim(scal_ext, j0_ext, band_rows, axis=0)
        gj = (shard_start - H) + j0_ext + jnp.arange(band_rows,
                                                     dtype=jnp.int32)
        in_range = (gj >= 0) & (gj < m_pad)
        usable_j = (sc[:, 9] > 0) & in_range
        dom_ok_j = (sc[:, 10] > 0) & in_range
        poison_j = (sc[:, 11] > 0) & in_range
        sc_j = scal_views(sc[:, :9], "row")

        names = ["sgg", "sgh"]
        tiles = [idot(gi_rows, gj_rows), idot(gi_rows, hj_rows)]
        if has_missing:
            names += ["sgm", "smg", "smm", "smh"]
            tiles += [idot(gi_rows, mj_rows), idot(mi_rows, gj_rows),
                      idot(mi_rows, mj_rows), idot(mi_rows, hj_rows)]
        tiles = lax.psum(jnp.stack(tiles), SAMP_AXIS)
        dots = dict(zip(names, tiles))
        r_add, r_dom = corr_from_dots(dots, sc_i, sc_j, n, n_padf,
                                      has_missing)
        aj = (None if a_ext is None else
              lax.dynamic_slice_in_dim(a_ext, j0_ext, band_rows, axis=0))
        return _tile_epilogue(r_add * n, r_dom * n, gi, gj, lo_i, hi_i,
                              usable_i, usable_j, dom_ok_j, poison_j,
                              n_samples, rsq_thr, aj=aj)

    accs = lax.map(pivot_block, jnp.arange(L // B, dtype=jnp.int32))
    flat = tuple(a.reshape(L) for a in accs[:6])
    if annot is not None:
        flat = flat + tuple(a.reshape(L, -1) for a in accs[6:])
    return flat + (usable, add_sd_zero, maf_out, rstd_out)


@partial(jax.jit,
         static_argnames=("maf_thr", "std_thr", "rsq_thr", "n_samples",
                          "n_pad_total", "block_size", "band_k", "halo_rows",
                          "mesh", "has_missing", "dot_dtype"))
def _grid_call(g, pos_ok, lo, hi, blk_lo, blk_hi, annot=None, *, maf_thr,
               std_thr, rsq_thr, n_samples, n_pad_total, block_size,
               band_k, halo_rows, mesh, has_missing, dot_dtype):
    fn = partial(_grid_shard_fn, maf_thr=maf_thr, std_thr=std_thr,
                 rsq_thr=jnp.float32(rsq_thr), n_samples=n_samples,
                 n_pad_total=n_pad_total, block_size=block_size,
                 band_k=band_k, halo_rows=halo_rows, m_pad=g.shape[0],
                 has_missing=has_missing, dot_dtype=dot_dtype)
    in_specs = (P(SNP_AXIS, SAMP_AXIS), P(SNP_AXIS), P(), P(), P(), P())
    args = (g, pos_ok, lo, hi, blk_lo, blk_hi)
    n_out = 10
    if annot is not None:
        in_specs = in_specs + (P(SNP_AXIS),)
        args = args + (annot,)
        n_out = 12
    out = jax.shard_map(
        fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=tuple([P(SNP_AXIS)] * n_out),
    )(*args)
    l2_acc, l2d_acc, ws, wsd, wse, poi = out[:6]
    usable, add_sd_zero, maf, rstd = out[-4:]
    fin = finalize_outputs(l2_acc, l2d_acc, ws, wsd, wse, poi, usable,
                           add_sd_zero)
    if annot is None:
        return fin + (maf, rstd)
    from ..ld.ld_int8 import finalize_annot  # noqa: PLC0415
    l2_a, l2d_a = finalize_annot(out[6], out[7], annot, usable,
                                 add_sd_zero, poi, wsd)
    return fin + (maf, rstd, l2_a, l2d_a)


def ld_scores_grid_sharded(genotypes: np.ndarray, positions: np.ndarray,
                           config, mesh: Mesh,
                           annot: np.ndarray | None = None) -> dict:
    """In-core LD scores over a 2-D (snp, samp) mesh.

    ``annot``: optional (M, p) annotation matrix (sharded along snp like
    the genotype rows).  Extends the result with ``l2_annot``/``l2d_annot``.
    """
    from ..ld import windows  # noqa: PLC0415
    from ..ld.pipeline import to_host_result  # noqa: PLC0415

    m, n = genotypes.shape
    B = config.block_size
    d_snp, d_samp = (mesh.shape[SNP_AXIS], mesh.shape[SAMP_AXIS])
    row_chunk = B * d_snp
    m_pad = -(-m // row_chunk) * row_chunk
    col_chunk = 128 * d_samp
    n_pad = -(-n // col_chunk) * col_chunk
    L = m_pad // d_snp
    if B > L:
        raise ValueError(f"block_size {B} exceeds shard rows {L}")

    lo, hi, pos_ok = windows.window_bounds(positions, config.ld_wind)
    blk_lo, blk_hi, band_k = windows.band_blocks(lo, hi, B, m_pad // B)
    halo = windows.max_halo_rows(lo, hi)
    halo_rows = min(-(-halo // B) * B, m_pad - L)

    g = np.full((m_pad, n_pad), -1, dtype=np.int8)
    g[:m, :n] = genotypes
    pos_ok_pad = np.zeros(m_pad, dtype=bool)
    pos_ok_pad[:m] = pos_ok
    lo_pad = np.concatenate([lo, np.full(m_pad - m, m_pad, np.int32)]).astype(np.int32)
    hi_pad = np.concatenate([hi, np.full(m_pad - m, -1, np.int32)]).astype(np.int32)
    has_missing = bool((genotypes < 0).any())

    a_dev = None
    if annot is not None:
        a_pad = np.zeros((m_pad, np.asarray(annot).shape[1]), np.float32)
        a_pad[:m] = np.asarray(annot, dtype=np.float32)
        a_dev = jnp.asarray(a_pad)

    with mesh:
        outs = _grid_call(
            jnp.asarray(g), jnp.asarray(pos_ok_pad), jnp.asarray(lo_pad),
            jnp.asarray(hi_pad), jnp.asarray(blk_lo), jnp.asarray(blk_hi),
            a_dev,
            maf_thr=float(config.maf_thr), std_thr=float(config.std_thr),
            rsq_thr=float(config.rsq_thr), n_samples=n, n_pad_total=n_pad,
            block_size=B, band_k=band_k, halo_rows=halo_rows, mesh=mesh,
            has_missing=has_missing, dot_dtype=config.int8_dot_dtype)

    l2, l2d, ws, wsd, wse, maf, rstd = outs[:7]
    result = to_host_result(l2, l2d, ws, wsd, wse, maf, rstd, m)
    if annot is not None:
        result["l2_annot"] = np.asarray(outs[7], dtype=np.float64)[:m]
        result["l2d_annot"] = np.asarray(outs[8], dtype=np.float64)[:m]
    return result
