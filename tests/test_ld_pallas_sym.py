"""Symmetric int8 Pallas kernel vs oracle (interpret mode on CPU).

The pipeline-level routes (``use_pallas=True`` + default symmetric) are
covered by test_golden / test_ld_pallas; this file pins the kernel
directly across its static branches: missing vs no-missing inputs, int8
vs bf16 dot dtypes, multi-chunk accumulation, and clamped right bands at
the matrix edge.
"""

import numpy as np

import jax.numpy as jnp

from nldsc_tpu.config import LDConfig
from nldsc_tpu.ld import ld_int8, ld_pallas_sym, windows
from nldsc_tpu.ld.oracle import oracle_ld
from nldsc_tpu.ld.pipeline import compute_ld_scores

from test_ld_device import assert_ld_parity
from utils import make_positions, random_genotypes


def _run_kernel(g, pos, *, B=32, wind=6000.0, missing_rate, dot_dtype,
                sample_chunk=128):
    m, n = g.shape
    m_pad = -(-m // B) * B
    n_pad = -(-n // 128) * 128
    has_missing = missing_rate > 0
    pad_val = np.int8(-1) if has_missing else np.int8(0)
    gp = np.full((m_pad, n_pad), pad_val, dtype=np.int8)
    gp[:m, :n] = g
    lo, hi, pos_ok = windows.window_bounds(pos, wind)
    blk_lo, blk_hi, _ = windows.band_blocks(lo, hi, B, m_pad // B)
    right_k = windows.right_band_blocks(blk_hi, B)
    pos_ok_p = np.zeros(m_pad, bool)
    pos_ok_p[:m] = pos_ok
    lo_p = np.full(m_pad, m_pad, np.int32)
    hi_p = np.full(m_pad, -1, np.int32)
    lo_p[:m], hi_p[:m] = lo, hi

    pre = ld_int8.preprocess_int8(
        jnp.asarray(gp), jnp.asarray(pos_ok_p), jnp.float32(0.01),
        n_samples=n, assume_no_missing=not has_missing)
    dom_ok = pre["usable"] & (pre["rstd"] > jnp.float32(1e-4))
    out = ld_pallas_sym.ld_scores_pallas_int8_sym(
        pre["g"], pre["m"], pre["h"], ld_int8.stack_scalars(pre),
        jnp.asarray(lo_p), jnp.asarray(hi_p), pre["usable"], dom_ok,
        pre["add_sd_zero"], rsq_thr=1e-3, block_size=B, right_k=right_k,
        n_samples=n, sample_chunk=sample_chunk, interpret=True,
        has_missing=has_missing, dot_dtype=dot_dtype)
    res = {k: np.asarray(v)[:m] for k, v in zip(
        ("l2", "l2d", "l2_ws", "l2d_ws", "l2d_wse"), out)}
    res["maf"] = np.asarray(pre["maf"])[:m]
    res["residuals_std"] = np.asarray(pre["rstd"])[:m]
    return res


def _check(res, g, pos, wind=6000.0):
    ora = oracle_ld(g, pos, wind, 0.01, 1e-4, 1e-3)
    np.testing.assert_allclose(res["l2"], ora["l2"], rtol=3e-6, atol=3e-6,
                               equal_nan=True)
    np.testing.assert_allclose(res["l2d"], ora["l2d"], rtol=3e-6, atol=3e-6,
                               equal_nan=True)
    np.testing.assert_array_equal(res["l2_ws"], ora["l2_ws"])
    np.testing.assert_array_equal(res["l2d_ws"], ora["l2d_ws"])
    np.testing.assert_array_equal(res["l2d_wse"], ora["l2d_wse"])


def test_pallas_sym_no_missing(rng):
    g = random_genotypes(rng, 160, 200, missing_rate=0.0)
    pos = make_positions(160, spacing=800, jitter_rng=rng)
    _check(_run_kernel(g, pos, missing_rate=0.0, dot_dtype="int8"), g, pos)


def test_pallas_sym_missing(rng):
    g = random_genotypes(rng, 160, 200, missing_rate=0.05)
    pos = make_positions(160, spacing=800, jitter_rng=rng)
    _check(_run_kernel(g, pos, missing_rate=0.05, dot_dtype="int8"), g, pos)


def test_pallas_sym_bf16_dots(rng):
    g = random_genotypes(rng, 160, 200, missing_rate=0.03)
    pos = make_positions(160, spacing=800, jitter_rng=rng)
    _check(_run_kernel(g, pos, missing_rate=0.03, dot_dtype="bf16"), g, pos)


def test_pallas_sym_wide_window_edge_clamp(rng):
    # window wider than the matrix: right_k == nb, every band clamped
    g = random_genotypes(rng, 96, 150, missing_rate=0.02)
    pos = make_positions(96, spacing=100, jitter_rng=rng)
    _check(_run_kernel(g, pos, missing_rate=0.02, dot_dtype="int8"), g, pos)


def test_pallas_sym_multi_chunk(rng):
    # N_pad = 384 -> 3 chunks of 128: exercises cross-chunk accumulation
    g = random_genotypes(rng, 64, 384, missing_rate=0.02)
    pos = make_positions(64, spacing=900, jitter_rng=rng)
    _check(_run_kernel(g, pos, missing_rate=0.02, dot_dtype="int8"), g, pos)


def test_pipeline_route_matches_xla(rng):
    # use_pallas + symmetric (defaults) must route here and agree with XLA
    g = random_genotypes(rng, 200, 260, missing_rate=0.03)
    pos = make_positions(200, spacing=700, jitter_rng=rng)
    kw = dict(ld_wind=5000, wind_metric="bp", maf_thr=0.01, std_thr=1e-4,
              rsq_thr=1e-3, block_size=64)
    res_x = compute_ld_scores(g, pos, LDConfig(**kw))
    res_p = compute_ld_scores(g, pos, LDConfig(
        **kw, use_pallas=True, interpret=True, sample_chunk=128))
    ora = oracle_ld(g, pos, 5000, 0.01, 1e-4, 1e-3)
    assert_ld_parity(res_x, ora)
    assert_ld_parity(res_p, ora)
