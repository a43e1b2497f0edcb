"""Partitioned (per-annotation) LD score tests: engine vs float64 oracle,
plus the end-to-end annot -> partitioned .L2 -> partitioned h2 chain.
"""

import numpy as np
import pandas as pd
import pytest

from nldsc_tpu.config import LDConfig
from nldsc_tpu.ld.oracle import oracle_ld, oracle_ld_annot
from nldsc_tpu.ld.pipeline import compute_ld_scores_annot
from utils import make_positions, random_genotypes

WIND, MAF, STD = 12000.0, 0.01, 1e-4


def _setup(rng, m=700, n=300, p=3, missing_rate=0.02):
    g = random_genotypes(rng, m, n, missing_rate=missing_rate)
    pos = make_positions(m, spacing=600, jitter_rng=rng).astype(np.float64)
    # mix binary and continuous annotations; first is the all-ones base
    annot = np.column_stack([
        np.ones(m),
        (rng.random(m) < 0.3).astype(np.float64),
        rng.uniform(0, 2, m),
    ])[:, :p]
    return g, pos, annot


@pytest.mark.parametrize("use_int8", [True, False])
def test_annot_engine_matches_oracle(use_int8):
    rng = np.random.default_rng(42)
    g, pos, annot = _setup(rng)
    config = LDConfig(ld_wind=WIND, wind_metric="bp", maf_thr=MAF,
                      std_thr=STD, rsq_thr=1e-3, block_size=128,
                      use_int8=use_int8)
    res = compute_ld_scores_annot(g, pos, annot, config)
    ora = oracle_ld_annot(g, pos, WIND, MAF, STD, annot)
    np.testing.assert_allclose(res["l2_annot"], ora["l2_annot"],
                               rtol=2e-5, atol=2e-4, equal_nan=True)
    np.testing.assert_allclose(res["l2d_annot"], ora["l2d_annot"],
                               rtol=2e-5, atol=2e-4, equal_nan=True)
    # base (all-ones) annotation reproduces the unpartitioned scores
    base = oracle_ld(g, pos, WIND, MAF, STD, 1e-3)
    np.testing.assert_allclose(res["l2_annot"][:, 0], base["l2"],
                               rtol=2e-5, atol=2e-4, equal_nan=True)
    np.testing.assert_allclose(res["l2d_annot"][:, 0], base["l2d"],
                               rtol=2e-5, atol=2e-4, equal_nan=True)
    # ... and the unpartitioned outputs ride along unchanged
    np.testing.assert_allclose(res["l2"], base["l2"], rtol=2e-5, atol=2e-4,
                               equal_nan=True)
    np.testing.assert_array_equal(res["l2_ws"], base["l2_ws"])


def test_annot_symmetric_matches_fullband():
    """The symmetric annot routing (default) equals the full-band engine:
    exact counters, scores to summation-order ulps."""
    rng = np.random.default_rng(45)
    g, pos, annot = _setup(rng, m=500, n=250)
    base = dict(ld_wind=WIND, wind_metric="bp", maf_thr=MAF, std_thr=STD,
                rsq_thr=1e-3, block_size=64)
    sym = compute_ld_scores_annot(g, pos, annot,
                                  LDConfig(**base, symmetric=True))
    full = compute_ld_scores_annot(g, pos, annot,
                                   LDConfig(**base, symmetric=False))
    for k in ("l2_ws", "l2d_ws", "l2d_wse"):
        np.testing.assert_array_equal(sym[k], full[k], err_msg=k)
    for k in ("l2", "l2d", "l2_annot", "l2d_annot"):
        np.testing.assert_allclose(sym[k], full[k], rtol=1e-5, atol=1e-5,
                                   equal_nan=True, err_msg=k)


def test_annot_engine_skip_sentinels():
    rng = np.random.default_rng(43)
    g, pos, annot = _setup(rng, m=400)
    pos[50:60] = -1.0  # skip sentinel
    config = LDConfig(ld_wind=WIND, wind_metric="bp", maf_thr=MAF,
                      std_thr=STD, rsq_thr=1e-3, block_size=64)
    res = compute_ld_scores_annot(g, pos, annot, config)
    ora = oracle_ld_annot(g, pos, WIND, MAF, STD, annot)
    np.testing.assert_allclose(res["l2_annot"], ora["l2_annot"],
                               rtol=2e-5, atol=2e-4, equal_nan=True)
    assert np.isnan(res["l2_annot"][50:60]).all()


def test_annot_end_to_end_files(tmp_path):
    # write a bfile + annot file, run the partitioned ld CLI path, feed the
    # partitioned .L2 into the partitioned h2 pipeline
    from nldsc_tpu.h2.pipeline import estimate_h2_partitioned
    from nldsc_tpu.io.plink import write_plink
    from nldsc_tpu.ld.pipeline import estimate_lds

    rng = np.random.default_rng(7)
    m, n = 600, 400
    g, pos, annot = _setup(rng, m=m, n=n, missing_rate=0.0)
    prefix = str(tmp_path / "toy")
    write_plink(prefix, g, bp=pos.astype(np.int64))
    snp = [f"snp{i}" for i in range(m)]  # write_plink names: check bim
    bim = pd.read_csv(prefix + ".bim", sep="\t", header=None)
    snp = bim[1].tolist()
    annot_df = pd.DataFrame({"SNP": snp, "base": annot[:, 0],
                             "cat": annot[:, 1], "cont": annot[:, 2]})
    annot_path = str(tmp_path / "toy.annot")
    annot_df.to_csv(annot_path, sep="\t", index=False)

    out = str(tmp_path / "toy.L2")
    estimate_lds(prefix, ld_wind=12000, wind_metric="bp", maf_thr=MAF,
                 std_thr=STD, out=out, annot=annot_path, block_size=128)

    df = pd.read_csv(out, sep="\t")
    assert {"base.L2", "cat.L2", "cont.L2", "base.L2D"} <= set(df.columns)
    m_side = pd.read_csv(str(tmp_path / "toy.M_5_50"), sep="\t")
    assert set(m_side.columns) == {"base.L2", "cat.L2", "cont.L2"}
    assert m_side["base.L2"].iloc[0] >= m_side["cat.L2"].iloc[0]

    # partitioned h2 consumes it (smoke: runs and returns all annotations)
    zs = rng.normal(size=m)
    ss = pd.DataFrame({"SNP": snp, "Z": zs, "N": 10000.0})
    ss_path = str(tmp_path / "toy.sumstats")
    ss.to_csv(ss_path, sep="\t", index=False)
    summary = estimate_h2_partitioned(ss_path, out, out, n_blocks=20,
                                      chisq_max=1e9)
    assert set(summary["annotations"]) == {"base.L2", "cat.L2", "cont.L2"}


@pytest.mark.parametrize("use_int8", [True, False])
def test_annot_streaming_matches_oracle(tmp_path, use_int8):
    # the out-of-core partitioned path (VERDICT r1 weak #6): chunked band
    # recompute with the per-chunk annotation contraction
    from nldsc_tpu.io.plink import BedReader, write_plink
    from nldsc_tpu.ld.streaming import compute_ld_scores_streaming

    rng = np.random.default_rng(44)
    m, n = 500, 220
    g, pos, annot = _setup(rng, m=m, n=n, missing_rate=0.03)
    prefix = write_plink(tmp_path / "sa", g, bp=pos.astype(np.int64))
    bed = BedReader(prefix + ".bed", m, n)
    config = LDConfig(ld_wind=WIND, wind_metric="bp", maf_thr=MAF,
                      std_thr=STD, rsq_thr=1e-3, block_size=32,
                      use_int8=use_int8)
    res = compute_ld_scores_streaming(bed, pos, config, chunk_rows=128,
                                      annot=annot)
    ora = oracle_ld_annot(g, pos, WIND, MAF, STD, annot)
    np.testing.assert_allclose(res["l2_annot"], ora["l2_annot"],
                               rtol=2e-5, atol=2e-4, equal_nan=True)
    np.testing.assert_allclose(res["l2d_annot"], ora["l2d_annot"],
                               rtol=2e-5, atol=2e-4, equal_nan=True)
    base = oracle_ld(g, pos, WIND, MAF, STD, 1e-3)
    np.testing.assert_allclose(res["l2"], base["l2"], rtol=2e-5, atol=2e-4,
                               equal_nan=True)
    np.testing.assert_array_equal(res["l2_ws"], base["l2_ws"])


def _row_missing(rng, m=600, n=256, p=3, contaminated_frac=0.03):
    """Row-structured missingness (minority of rows carry gaps) so the
    split-corrections route engages."""
    g, pos, annot = _setup(rng, m=m, n=n, p=p, missing_rate=0.0)
    rows = rng.choice(m, size=max(2, int(m * contaminated_frac)),
                      replace=False)
    for i in rows:
        miss = rng.random(n) < 0.1
        g[i] = np.where(miss, np.int8(-1), g[i])
    return g, pos, annot


def test_annot_split_missing_matches_global():
    """annot × split-missing (VERDICT r3 #3): the clean symmetric annot
    scan + annot δ-corrections equal the global missing engine — exact
    counters, annot credits to contraction-precision."""
    rng = np.random.default_rng(46)
    g, pos, annot = _row_missing(rng)
    base = dict(ld_wind=WIND, wind_metric="bp", maf_thr=MAF, std_thr=STD,
                rsq_thr=1e-3, block_size=64)
    split = compute_ld_scores_annot(
        g, pos, annot, LDConfig(**base, split_missing=True, symmetric=True))
    full = compute_ld_scores_annot(
        g, pos, annot, LDConfig(**base, split_missing=False,
                                symmetric=False))
    for k in ("l2_ws", "l2d_ws", "l2d_wse"):
        np.testing.assert_array_equal(split[k], full[k], err_msg=k)
    for k in ("l2", "l2d"):
        np.testing.assert_allclose(split[k], full[k], rtol=1e-5, atol=1e-5,
                                   equal_nan=True, err_msg=k)
    for k in ("l2_annot", "l2d_annot"):
        # bf16x3 contraction noise on the annot credits
        np.testing.assert_allclose(split[k], full[k], rtol=5e-5, atol=5e-4,
                                   equal_nan=True, err_msg=k)
    ora = oracle_ld_annot(g, pos, WIND, MAF, STD, annot)
    np.testing.assert_allclose(split["l2_annot"], ora["l2_annot"],
                               rtol=2e-5, atol=5e-4, equal_nan=True)
    np.testing.assert_allclose(split["l2d_annot"], ora["l2d_annot"],
                               rtol=2e-5, atol=5e-4, equal_nan=True)


def test_annot_auto_routes_split():
    """Default config + minority row-missing: the annot path must select
    the split composition and still match the oracle."""
    rng = np.random.default_rng(47)
    g, pos, annot = _row_missing(rng, m=400)
    res = compute_ld_scores_annot(
        g, pos, annot, LDConfig(ld_wind=WIND, wind_metric="bp", maf_thr=MAF,
                                std_thr=STD, rsq_thr=1e-3, block_size=64))
    ora = oracle_ld_annot(g, pos, WIND, MAF, STD, annot)
    np.testing.assert_allclose(res["l2_annot"], ora["l2_annot"],
                               rtol=2e-5, atol=5e-4, equal_nan=True)
    np.testing.assert_allclose(res["l2d_annot"], ora["l2d_annot"],
                               rtol=2e-5, atol=5e-4, equal_nan=True)


@pytest.mark.parametrize("axis", ["snp", "samples", "grid"])
def test_annot_sharded_matches_dense(axis):
    """Partitioned LD over every mesh axis == the dense annot engine
    (VERDICT r3 #3: --annot no longer degrades to a single device)."""
    import jax

    from nldsc_tpu.parallel import (ld_scores_sample_sharded,
                                    ld_scores_sharded, snp_mesh)
    from nldsc_tpu.parallel.grid_sharded import (grid_mesh,
                                                 ld_scores_grid_sharded)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(48)
    g, pos, annot = _setup(rng, m=512, n=200, missing_rate=0.02)
    config = LDConfig(ld_wind=WIND, wind_metric="bp", maf_thr=MAF,
                      std_thr=STD, rsq_thr=1e-3, block_size=32)
    dense = compute_ld_scores_annot(g, pos, annot, config)
    if axis == "snp":
        res = ld_scores_sharded(g, pos, config, snp_mesh(8), annot=annot)
    elif axis == "samples":
        res = ld_scores_sample_sharded(g, pos, config, snp_mesh(8),
                                       annot=annot)
    else:
        res = ld_scores_grid_sharded(g, pos, config, grid_mesh(4, 2),
                                     annot=annot)
    for k in ("l2_ws", "l2d_ws", "l2d_wse"):
        np.testing.assert_array_equal(res[k], dense[k], err_msg=k)
    for k in ("l2", "l2d", "l2_annot", "l2d_annot"):
        np.testing.assert_allclose(res[k], dense[k], rtol=2e-5, atol=2e-4,
                                   equal_nan=True, err_msg=k)


def test_annot_streaming_split_matches_dense(tmp_path):
    """Streaming annot × split-missing (r4): the chunk annot payload
    absorbs the annot δ-corrections; equals the dense annot engine."""
    from nldsc_tpu.io.plink import BedReader, write_plink
    from nldsc_tpu.ld.pipeline import compute_ld_scores
    from nldsc_tpu.ld.streaming import compute_ld_scores_streaming

    rng = np.random.default_rng(51)
    g, pos, annot = _row_missing(rng, m=520, n=220)
    prefix = write_plink(tmp_path / "sas", g, bp=pos.astype(np.int64))
    bed = BedReader(prefix + ".bed", g.shape[0], g.shape[1])
    config = LDConfig(ld_wind=WIND, wind_metric="bp", maf_thr=MAF,
                      std_thr=STD, rsq_thr=1e-3, block_size=32,
                      split_missing=True)
    res = compute_ld_scores_streaming(bed, pos, config, chunk_rows=128,
                                      annot=annot)
    dense = compute_ld_scores(g, pos, config, annot=annot)
    for k in ("l2_ws", "l2d_ws", "l2d_wse"):
        np.testing.assert_array_equal(res[k], dense[k], err_msg=k)
    for k in ("l2", "l2d"):
        np.testing.assert_allclose(res[k], dense[k], rtol=2e-5, atol=2e-4,
                                   equal_nan=True, err_msg=k)
    for k in ("l2_annot", "l2d_annot"):
        np.testing.assert_allclose(res[k], dense[k], rtol=5e-5, atol=5e-4,
                                   equal_nan=True, err_msg=k)


@pytest.mark.parametrize("axis", ["samples", "grid"])
def test_annot_streaming_meshes_match_dense(tmp_path, axis):
    """Streaming annot over the sample mesh and the 2-D grid (r4: the
    last annot gap) == the dense annot engine."""
    import jax

    from nldsc_tpu.io.plink import BedReader, write_plink
    from nldsc_tpu.ld.pipeline import compute_ld_scores
    from nldsc_tpu.ld.streaming import compute_ld_scores_streaming
    from nldsc_tpu.parallel import snp_mesh
    from nldsc_tpu.parallel.grid_sharded import grid_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(52)
    g, pos, annot = _setup(rng, m=384, n=200, missing_rate=0.02)
    prefix = write_plink(tmp_path / "sm", g, bp=pos.astype(np.int64))
    bed = BedReader(prefix + ".bed", g.shape[0], g.shape[1])
    config = LDConfig(ld_wind=WIND, wind_metric="bp", maf_thr=MAF,
                      std_thr=STD, rsq_thr=1e-3, block_size=32)
    kw = (dict(sample_mesh=snp_mesh(8)) if axis == "samples"
          else dict(grid=grid_mesh(4, 2)))
    res = compute_ld_scores_streaming(bed, pos, config, chunk_rows=128,
                                      annot=annot, **kw)
    dense = compute_ld_scores(g, pos, config, annot=annot)
    for k in ("l2_ws", "l2d_ws", "l2d_wse"):
        np.testing.assert_array_equal(res[k], dense[k], err_msg=k)
    for k in ("l2", "l2d", "l2_annot", "l2d_annot"):
        np.testing.assert_allclose(res[k], dense[k], rtol=5e-5, atol=5e-4,
                                   equal_nan=True, err_msg=k)


def test_annot_cli_sharded(tmp_path):
    """estimate_lds --annot now honors n_devices/shard flags end-to-end."""
    import jax

    from nldsc_tpu.io.plink import write_plink
    from nldsc_tpu.ld.pipeline import estimate_lds

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(49)
    m, n = 384, 200
    g, pos, annot = _setup(rng, m=m, n=n, missing_rate=0.0)
    prefix = str(tmp_path / "shard")
    write_plink(prefix, g, bp=pos.astype(np.int64))
    bim = pd.read_csv(prefix + ".bim", sep="\t", header=None)
    annot_df = pd.DataFrame({"SNP": bim[1], "base": annot[:, 0],
                             "cat": annot[:, 1], "cont": annot[:, 2]})
    annot_path = str(tmp_path / "shard.annot")
    annot_df.to_csv(annot_path, sep="\t", index=False)

    kw = dict(ld_wind=WIND, wind_metric="bp", maf_thr=MAF, std_thr=STD,
              annot=annot_path, block_size=32)
    dense = estimate_lds(prefix, n_devices=1, **kw)
    sharded = estimate_lds(prefix, n_devices=8, **kw)
    grid = estimate_lds(prefix, n_devices=8, shard_grid=True, **kw)
    samp = estimate_lds(prefix, n_devices=8, shard_samples=True, **kw)
    for df in (sharded, grid, samp):
        pd.testing.assert_frame_equal(
            df, dense, check_exact=False, rtol=1e-4, atol=1e-4)


def test_n_devices_validation(tmp_path):
    from nldsc_tpu.core.errors import NLDSCParameterError
    from nldsc_tpu.io.plink import write_plink
    from nldsc_tpu.ld.pipeline import estimate_lds

    rng = np.random.default_rng(50)
    g, pos, _ = _setup(rng, m=64, n=64, missing_rate=0.0)
    prefix = str(tmp_path / "val")
    write_plink(prefix, g, bp=pos.astype(np.int64))
    with pytest.raises(NLDSCParameterError, match="exceeds"):
        estimate_lds(prefix, ld_wind=WIND, wind_metric="bp", maf_thr=MAF,
                     n_devices=4096)


def test_read_annot_alignment(tmp_path):
    from nldsc_tpu.io.ldscores import read_annot

    bim = pd.DataFrame({"SNP": ["a", "b", "c"]})
    # shuffled order + an extra SNP not in bim + one bim SNP missing
    tab = pd.DataFrame({"SNP": ["c", "x", "a"], "CHR": 1,
                        "k1": [3.0, 9.0, 1.0], "k2": [30.0, 90.0, 10.0]})
    path = str(tmp_path / "t.annot")
    tab.to_csv(path, sep="\t", index=False)
    vals, names = read_annot(path, bim)
    assert names == ["k1", "k2"]
    np.testing.assert_allclose(vals, [[1.0, 10.0], [0.0, 0.0], [3.0, 30.0]])
    with pytest.raises(ValueError, match="SNP column"):
        bad = str(tmp_path / "bad.annot")
        tab.drop(columns="SNP").to_csv(bad, sep="\t", index=False)
        read_annot(bad, bim)
