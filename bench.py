"""Benchmark: windowed LD-score pass throughput (SNPs/s/chip).

Prints ONE JSON line to stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

* value: SNPs/s on the real chip for the full additive+dominance windowed
  LD pass (fused on-device preprocess + symmetric integer-exact banded
  engine), N=16384 samples, window ±1000 SNPs, over a batch of EIGHT
  16384-SNP chromosome segments (position-separated, so windows never
  cross segments) in ONE dispatch — the real product shape: an
  `estimate_lds` run is one engine dispatch per chromosome, so per-call
  runtime/tunnel overhead (~30 ms fixed on this runtime, REPS-invariant;
  see scripts/time_reps.py) is amortized over the whole M exactly as it
  is here.  Secondary keys report the 2%-missing rate (8-matmul engine
  path) and the TRUE end-to-end bfile→.L2 wall-clock (disk decode + host
  transfer + compute + TSV write, no on-device generation).
* vs_baseline: ratio against a single-node CPU baseline implementing the
  same blocked-BLAS algorithm in NumPy f32 (multithreaded OpenBLAS) — a
  *stronger* stand-in for the reference's C++/Armadillo per-pair engine
  (the reference publishes no numbers; BASELINE.md protocol).

Timing methodology notes (axon remote runtime): benchmark genotypes are
generated ON DEVICE (host→device staging of GBs through the tunnel would
dominate and is not part of the measured pass), the warm-up run uses
different data than the timed run (identical calls are memoized), and
outputs are DEVICE-REDUCED to two scalars (r5) so the timed region is
dispatch + compute, not a 0.5 MB payload crawl over the tunnel.  The
JSON also carries `drift_control_int8_tops` — a fixed engine-independent
chained-matmul workload — so cross-round moves in the headline are
attributable to code vs environment weather, and `e2e_decomposition`
splits the end-to-end figure into {disk, transfer, device, write}.
"""

import json
import sys
import time

import numpy as np

M, N, WIN_SNPS = 16384, 16384, 1000
SEGMENTS = 8                   # one-dispatch batch: 8 x M rows
SPACING = 100.0
BLOCK = 512   # scripts/time_block.py: highest per-step MXU efficiency
MAF_THR, STD_THR, RSQ_THR = 0.01, 1e-4, 1e-3

CPU_M = 2048  # CPU baseline runs a subset, rate extrapolates per-SNP


def make_inputs(m, n, seed):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 3, size=(m, n), dtype=np.int8)
    pos = np.arange(1, m + 1, dtype=np.float64) * SPACING
    return g, pos


def segment_positions(m_total: int) -> np.ndarray:
    """Positions for SEGMENTS independent chromosome segments: contiguous
    within a segment, 1e9 bp apart between segments (no cross-segment
    windows)."""
    seg = np.arange(1, M + 1, dtype=np.float64) * SPACING
    return np.concatenate(
        [seg + i * 1e9 for i in range(m_total // M)])


def tpu_pass(has_missing=False, row_missing=False):
    """One-dispatch device LD pass over SEGMENTS×M SNPs; returns
    (seconds, m_total).

    The whole pass — on-device synthetic genotype generation is OUTSIDE
    the timed region; fused preprocess + the symmetric integer-exact
    engine (int8 MXU matmuls, exact int32 accumulation, analytic
    centering) + the l2 fetch are inside — exactly one jit call, like a
    production per-chromosome run.

    ``has_missing``: entry-uniform 2% missing (EVERY row contaminated —
    the worst case; global 8-matmul epilogue).  ``row_missing``:
    realistic missingness concentrated in 2% of SNP rows (5% of samples
    missing within those) — routed through the split-missing engine
    (clean 3-matmul pass + compact exact corrections, ld_split.py).
    """
    import jax
    import jax.numpy as jnp

    from nldsc_tpu.ld import ld_int8, ld_split, windows

    m_total = SEGMENTS * M
    pos = segment_positions(m_total)
    lo, hi, pos_ok = windows.window_bounds(pos, WIN_SNPS * SPACING)
    blk_lo, blk_hi, band_k = windows.band_blocks(lo, hi, BLOCK,
                                                 m_total // BLOCK)
    right_k = windows.right_band_blocks(blk_hi, BLOCK)
    meta = (jnp.asarray(pos_ok), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(blk_lo), jnp.asarray(blk_hi))

    any_missing = has_missing or row_missing
    if row_missing:
        rowmiss_h = np.zeros(m_total, dtype=bool)
        rowmiss_h[::50] = True                      # 2% of rows
        plan = ld_split.plan_split_v2(
            rowmiss_h, lo, hi, min(ld_split.SEG_ROWS_DEFAULT, m_total),
            m_total)
        rowmiss_dev = jnp.asarray(rowmiss_h)

    @jax.jit
    def gen(key):
        g = jax.random.randint(key, (m_total, N), 0, 3, jnp.int8)
        if row_missing:
            miss = jax.random.bernoulli(jax.random.fold_in(key, 1),
                                        0.05, (m_total, N))
            miss = miss & jnp.asarray(rowmiss_h)[:, None]
            g = jnp.where(miss, jnp.int8(-1), g)
        elif has_missing:
            miss = jax.random.bernoulli(jax.random.fold_in(key, 1),
                                        0.02, (m_total, N))
            g = jnp.where(miss, jnp.int8(-1), g)
        return g

    @jax.jit
    def full_pass(g_dev):
        pre = ld_int8.preprocess_int8(g_dev, meta[0], jnp.float32(MAF_THR),
                                      n_samples=N,
                                      assume_no_missing=not any_missing,
                                      materialize_m=not row_missing)
        dom_ok = pre["usable"] & (pre["rstd"] > jnp.float32(STD_THR))
        args = (pre["g"], pre["m"], pre["h"], ld_int8.stack_scalars(pre),
                meta[1], meta[2], pre["usable"], dom_ok, pre["add_sd_zero"])
        if row_missing:
            # v2 split: clean scan over all pairs + segmented δ-corrections
            # (the indicator matrix exists only as the COMPACT rows)
            m_c = ld_split.compact_missing_rows(
                g_dev, jnp.asarray(plan["miss_idx"]))
            out = ld_split.ld_scores_split(
                args[0], m_c, *args[2:], rowmiss_dev,
                jnp.float32(RSQ_THR), plan,
                block_size=BLOCK, right_k=right_k, n_samples=N,
                dot_dtype="int8")
        else:
            out = ld_int8.ld_scores_int8_sym(
                *args, meta[3], meta[4],
                jnp.float32(RSQ_THR), block_size=BLOCK, band_k=band_k,
                right_k=right_k, n_samples=N, has_missing=has_missing,
                dot_dtype="int8")
        # DEVICE-REDUCED outputs (r5, VERDICT r4 #1b): the timed fetch is
        # two scalars, not the M-row payload — a 0.5 MB l2 fetch over the
        # drifting tunnel (10-30 MB/s) added an unattributable 20-50 ms
        # to every rep in r1-r4.
        l2 = out[0]
        fin = jnp.isfinite(l2)
        return jnp.stack([jnp.sum(jnp.where(fin, l2, 0.0)),
                          jnp.sum(fin).astype(jnp.float32)])

    # min over five DISTINCT timed inputs: the tunneled runtime's
    # run-to-run drift is up to 4x, and the min tracks true device time
    # (identical calls are memoized, so every rep must differ).  Inputs
    # are generated one at a time and freed after use — each is 2 GB of
    # HBM (m_total x N int8) and holding six at once OOMs the chip.
    dts = []
    for k in range(6):
        g_dev = gen(jax.random.PRNGKey(k))
        np.asarray(g_dev[:1, :1])             # force generation
        t0 = time.time()
        v = np.asarray(full_pass(g_dev))      # timed: 1 dispatch +
        dt = time.time() - t0                 #        1 tiny fetch
        del g_dev
        assert v[1] > m_total * 0.9 and np.isfinite(v[0])
        if k > 0:                             # k=0 pays compile/warm-up
            dts.append(dt)
    return min(dts), m_total


def drift_control():
    """Fixed-workload drift control (r5, VERDICT r4 #1b): Q dependency-
    chained 8192³ int8 matmuls in ONE dispatch, scalar fetch — the
    `scripts/probe_mxu.py` protocol.  This number depends ONLY on the
    chip + runtime weather, never on engine code, so any cross-round move
    in the headline that the control does not share is a code effect, and
    any move it does share is environment drift (the r4 "20% drop"
    appeared in the same JSON as a 20% CPU-baseline drop — weather)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    S, Q = 8192, 8
    dims = (((1,), (1,)), ((), ()))   # NT layout, same as the engines

    def cast_codes(v):
        return (v % 3).astype(jnp.int8)

    @jax.jit
    def chain(x0, y):
        x = x0
        acc = None
        for _ in range(Q):
            acc = lax.dot_general(x, y, dims,
                                  preferred_element_type=jnp.int32)
            x = cast_codes(acc)
        return acc[0, 0]

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(17), 3)
    gen = lambda k: cast_codes(                            # noqa: E731
        jax.random.randint(k, (S, S), 0, 3, jnp.int32))
    x_w, x_t, y = gen(k1), gen(k2), gen(k3)
    np.asarray(chain(x_w, y))          # compile + warm (distinct data)
    t0 = time.time()
    np.asarray(chain(x_t, y))
    dt = (time.time() - t0) / Q
    return 2.0 * S ** 3 / dt / 1e12


def e2e_bfile_to_l2(g_warm, g, pos):
    """End-to-end wall-clock: .bed on disk -> .L2 written (chr scale).

    Covers the WHOLE user path the reference bar measures: packed .bed
    read, host->device transfer over the tunnel, on-device unpack +
    preprocess + banded pass, result fetch, TSV + .M sidecar writes.
    A warm-up run on a DIFFERENT dataset (distinct data defeats the
    runtime's call memoization) excludes one-time jit compilation, which
    in production amortizes across chromosomes.
    """
    import tempfile

    from nldsc_tpu.io.plink import write_plink
    from nldsc_tpu.ld.pipeline import estimate_lds

    kw = dict(ld_wind=WIN_SNPS * SPACING / 1000.0, wind_metric="kbp",
              maf_thr=MAF_THR, std_thr=STD_THR, block_size=BLOCK,
              progress=False)
    with tempfile.TemporaryDirectory() as td:
        pw = write_plink(f"{td}/warm", g_warm, bp=pos.astype(np.int64))
        estimate_lds(pw, out=f"{td}/warm.L2", **kw)          # compile
        prefix = write_plink(f"{td}/bench", g, bp=pos.astype(np.int64))
        out = f"{td}/bench.L2"
        t0 = time.time()
        estimate_lds(prefix, out=out, **kw)
        dt = time.time() - t0
        n_rows = sum(1 for _ in open(out)) - 1
        assert n_rows == g.shape[0]
    from nldsc_tpu.ld import pipeline
    stages = {k: round(v, 3) for k, v in pipeline.STAGE_TIMES.items()}
    stages["other_s"] = round(dt - sum(stages.values()), 3)
    return dt, stages


def cpu_baseline(g, pos):
    """Same blocked algorithm in NumPy f32 on CPU (BLAS sgemm)."""
    m, n = g.shape
    gf = g.astype(np.float32)
    a = gf - gf.mean(axis=1, keepdims=True)
    sd = np.sqrt((a * a).mean(axis=1, keepdims=True))
    xa = a / sd
    d = np.minimum(gf, 1.0) * 2.0
    dc = d - d.mean(axis=1, keepdims=True)
    slope = (a * dc).sum(axis=1, keepdims=True) / (a * a).sum(axis=1, keepdims=True)
    r = dc - slope * a
    rs = np.sqrt((r * r).mean(axis=1, keepdims=True))
    xr = r / np.where(rs > 0, rs, 1.0)

    w = int(WIN_SNPS)
    adj = (n - 1.0) / (n - 2.0)
    t0 = time.time()
    l2 = np.empty(m)
    l2d = np.empty(m)
    for s in range(0, m, BLOCK):
        e = min(s + BLOCK, m)
        j0, j1 = max(0, s - w), min(m, e + w)
        c = xa[s:e] @ xa[j0:j1].T / n
        cd = xa[s:e] @ xr[j0:j1].T / n
        aa = 1.0 - (1.0 - c * c) * adj
        ad = 1.0 - (1.0 - cd * cd) * adj
        gi = np.arange(s, e)[:, None]
        gj = np.arange(j0, j1)[None, :]
        mask = (np.abs(gj - gi) <= w) & (gj != gi)
        l2[s:e] = 1.0 + (aa * mask).sum(axis=1)
        l2d[s:e] = (ad * mask).sum(axis=1)
    return time.time() - t0


def main():
    # --- CPU baseline (subset, extrapolated per-SNP rate; min over 3
    # reps — host scheduling noise swung single-shot runs 3x, which
    # polluted vs_baseline even though it is only a control) ---
    g_cpu, pos_cpu = make_inputs(CPU_M, N, seed=11)
    cpu_dt = min(cpu_baseline(g_cpu, pos_cpu) for _ in range(3))
    cpu_rate = CPU_M / cpu_dt

    # --- TPU pass, clean data (the headline number) ---
    dt, m_total = tpu_pass()
    rate = m_total / dt

    # --- TPU pass, entry-uniform 2% missing (worst case: every row
    # contaminated, global 8-matmul engine path) ---
    dt_miss, _ = tpu_pass(has_missing=True)
    rate_miss = m_total / dt_miss

    # --- TPU pass, missing concentrated in 2% of rows (realistic;
    # split-missing engine: clean-rate pass + compact corrections) ---
    dt_rowmiss, _ = tpu_pass(row_missing=True)
    rate_rowmiss = m_total / dt_rowmiss

    # --- end-to-end bfile -> .L2 (decode + transfer + compute + write) ---
    g_e2e, pos_e2e = make_inputs(M, N, seed=40)
    g_e2e_warm, _ = make_inputs(M, N, seed=41)
    rng = np.random.default_rng(31)
    g_e2e[rng.random(g_e2e.shape) < 0.02] = -1
    g_e2e_warm[rng.random(g_e2e_warm.shape) < 0.02] = -1
    e2e_dt, e2e_stages = e2e_bfile_to_l2(g_e2e_warm, g_e2e, pos_e2e)

    # fixed-workload drift control: engine-independent chip+tunnel rate
    control_tops = drift_control()

    print(json.dumps({
        "metric": "ld_snps_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": (f"SNPs/s/chip (M={m_total} = {SEGMENTS}x{M} segments, "
                 f"N={N}, window ±{WIN_SNPS} SNPs, add+dom, one dispatch, "
                 f"device-reduced outputs)"),
        "vs_baseline": round(rate / cpu_rate, 2),
        "missing2pct_snps_per_sec": round(rate_miss, 1),
        "missing2pct_rows_snps_per_sec": round(rate_rowmiss, 1),
        "e2e_bfile_to_l2_seconds": round(e2e_dt, 2),
        "e2e_snps_per_sec": round(M / e2e_dt, 1),
        "e2e_decomposition": e2e_stages,
        "drift_control_int8_tops": round(control_tops, 1),
    }))
    print(f"# tpu: {dt:.3f}s ({rate:,.0f} SNPs/s) | 2% entries missing: "
          f"{rate_miss:,.0f} | 2% rows missing (split): "
          f"{rate_rowmiss:,.0f} SNPs/s | e2e bfile->L2 (M={M}): {e2e_dt:.1f}s "
          f"{e2e_stages} | drift-control {control_tops:.0f} int8 Tops/s "
          f"| cpu-baseline: {cpu_rate:,.0f} SNPs/s (NumPy/BLAS subset "
          f"M={CPU_M}, add+dom)", file=sys.stderr)


if __name__ == "__main__":
    main()
