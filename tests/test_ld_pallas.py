"""Pallas fused kernel vs XLA path (interpret mode on CPU) and vs oracle."""

import numpy as np

from nldsc_tpu.config import LDConfig
from nldsc_tpu.ld.oracle import oracle_ld
from nldsc_tpu.ld.pipeline import compute_ld_scores

from test_ld_device import assert_ld_parity
from utils import adversarial_genotypes, make_positions, random_genotypes


def _run_both(g, pos, **kw):
    kw.setdefault("ld_wind", 5000)
    kw.setdefault("wind_metric", "bp")
    kw.setdefault("maf_thr", 0.01)
    kw.setdefault("std_thr", 1e-4)
    kw.setdefault("rsq_thr", 1e-3)
    kw.setdefault("block_size", 64)
    cfg_x = LDConfig(**kw, use_pallas=False)
    cfg_p = LDConfig(**kw, use_pallas=True, interpret=True, sample_chunk=128)
    return compute_ld_scores(g, pos, cfg_x), compute_ld_scores(g, pos, cfg_p)


def _assert_same(res_x, res_p):
    for k in ("l2", "l2d", "maf", "residuals_std"):
        np.testing.assert_allclose(res_p[k], res_x[k], rtol=1e-5, atol=1e-5,
                                   equal_nan=True, err_msg=k)
    for k in ("l2_ws", "l2d_ws", "l2d_wse"):
        np.testing.assert_array_equal(res_p[k], res_x[k], err_msg=k)


def test_pallas_matches_xla_basic(rng):
    g = random_genotypes(rng, 200, 300, missing_rate=0.03)
    pos = make_positions(200, spacing=777, jitter_rng=rng)
    res_x, res_p = _run_both(g, pos)
    _assert_same(res_x, res_p)


def test_pallas_matches_oracle_adversarial(rng):
    adv = adversarial_genotypes(rng, 256)
    g = np.concatenate([random_genotypes(rng, 40, 256, missing_rate=0.05),
                        adv,
                        random_genotypes(rng, 40, 256, missing_rate=0.05)])
    pos = make_positions(len(g), spacing=1000, skip_idx=(3, 50))
    cfg = LDConfig(ld_wind=20000, wind_metric="bp", maf_thr=1e-5,
                   std_thr=1e-4, rsq_thr=1e-3, block_size=32,
                   use_pallas=True, interpret=True, sample_chunk=128)
    res = compute_ld_scores(g, pos, cfg)
    ora = oracle_ld(g, pos, cfg.ld_wind, cfg.maf_thr, cfg.std_thr, cfg.rsq_thr)
    assert_ld_parity(res, ora)


def test_pallas_uneven_chunks(rng):
    # N_pad = 256 with sample_chunk 128 -> 2 chunks; odd M forces padding
    g = random_genotypes(rng, 77, 130, missing_rate=0.02)
    pos = make_positions(77, spacing=400)
    res_x, res_p = _run_both(g, pos, block_size=48)
    _assert_same(res_x, res_p)
