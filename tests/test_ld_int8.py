"""Integer-exact engine vs float64 oracle — should be the TIGHTEST engine."""

import numpy as np
import pytest

from nldsc_tpu.config import LDConfig
from nldsc_tpu.ld.oracle import oracle_ld
from nldsc_tpu.ld.pipeline import compute_ld_scores

from test_ld_device import assert_ld_parity
from utils import adversarial_genotypes, make_positions, random_genotypes


def _cfg(**kw):
    kw.setdefault("ld_wind", 5000)
    kw.setdefault("wind_metric", "bp")
    kw.setdefault("maf_thr", 0.01)
    kw.setdefault("std_thr", 1e-4)
    kw.setdefault("rsq_thr", 1e-3)
    kw.setdefault("block_size", 64)
    kw.setdefault("use_int8", True)
    return LDConfig(**kw)


@pytest.mark.parametrize("symmetric", [True, False])
def test_int8_parity_basic(rng, symmetric):
    g = random_genotypes(rng, 200, 300, missing_rate=0.03)
    pos = make_positions(200, spacing=777, jitter_rng=rng)
    cfg = _cfg(symmetric=symmetric)
    res = compute_ld_scores(g, pos, cfg)
    ora = oracle_ld(g, pos, cfg.ld_wind, cfg.maf_thr, cfg.std_thr, cfg.rsq_thr)
    # integer-exact contraction: tighter tolerance than the f32 engines
    assert_ld_parity(res, ora, rtol=3e-6, atol=3e-6)


@pytest.mark.parametrize("symmetric", [True, False])
def test_int8_adversarial_sym(rng, symmetric):
    adv = adversarial_genotypes(rng, 128)
    g = np.concatenate([random_genotypes(rng, 45, 128, missing_rate=0.05),
                        adv,
                        random_genotypes(rng, 45, 128, missing_rate=0.0)])
    pos = make_positions(len(g), spacing=1000, skip_idx=(7,))
    cfg = _cfg(ld_wind=15000, maf_thr=1e-5, block_size=16,
               symmetric=symmetric)
    res = compute_ld_scores(g, pos, cfg)
    ora = oracle_ld(g, pos, cfg.ld_wind, cfg.maf_thr, cfg.std_thr, cfg.rsq_thr)
    assert_ld_parity(res, ora)


def test_int8_no_missing_fast_path(rng):
    # no real missing -> the 2-matmul path (even with sample padding:
    # N=250 is not a multiple of 128, exercising the analytic pad term)
    g = random_genotypes(rng, 128, 250, missing_rate=0.0)
    pos = make_positions(128, spacing=500)
    cfg = _cfg(block_size=32)
    res = compute_ld_scores(g, pos, cfg)
    ora = oracle_ld(g, pos, cfg.ld_wind, cfg.maf_thr, cfg.std_thr, cfg.rsq_thr)
    assert_ld_parity(res, ora, rtol=3e-6, atol=3e-6)


def test_int8_parity_adversarial(rng):
    adv = adversarial_genotypes(rng, 256)
    g = np.concatenate([random_genotypes(rng, 40, 256, missing_rate=0.05),
                        adv,
                        random_genotypes(rng, 40, 256, missing_rate=0.05)])
    pos = make_positions(len(g), spacing=1000, skip_idx=(3, 50))
    cfg = _cfg(ld_wind=20000, maf_thr=1e-5, block_size=32)
    res = compute_ld_scores(g, pos, cfg)
    ora = oracle_ld(g, pos, cfg.ld_wind, cfg.maf_thr, cfg.std_thr, cfg.rsq_thr)
    assert_ld_parity(res, ora)


def test_int8_heavy_missing(rng):
    g = random_genotypes(rng, 100, 150, missing_rate=0.4)
    pos = make_positions(100, spacing=600)
    cfg = _cfg(block_size=32)
    res = compute_ld_scores(g, pos, cfg)
    ora = oracle_ld(g, pos, cfg.ld_wind, cfg.maf_thr, cfg.std_thr, cfg.rsq_thr)
    assert_ld_parity(res, ora)


@pytest.mark.parametrize("missing_rate", [0.0, 0.05])
def test_int8_pallas_kernel(rng, missing_rate):
    g = random_genotypes(rng, 96, 140, missing_rate=missing_rate)
    pos = make_positions(96, spacing=700)
    cfg = _cfg(block_size=32, use_pallas=True, interpret=True,
               sample_chunk=128)
    res = compute_ld_scores(g, pos, cfg)
    ora = oracle_ld(g, pos, cfg.ld_wind, cfg.maf_thr, cfg.std_thr,
                    cfg.rsq_thr)
    tol = dict(rtol=3e-6, atol=3e-6) if missing_rate == 0 else {}
    assert_ld_parity(res, ora, **tol)
