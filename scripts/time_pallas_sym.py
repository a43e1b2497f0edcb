"""Sweep the fused symmetric int8 Pallas kernel on the real chip.

RTT-amortized protocol (PERFORMANCE.md): warm with different data than
the timed run (memoization), dispatch REPS distinct inputs async, fetch
once.  Compares against the XLA symmetric engine in the same process.

Usage: python scripts/time_pallas_sym.py [M] [N] [W]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax.numpy as jnp

from nldsc_tpu.ld import ld_int8, ld_pallas_sym, windows

argv = [int(a) for a in sys.argv[1:]]
M = argv[0] if argv else 16384
N = argv[1] if len(argv) > 1 else 16384
W = argv[2] if len(argv) > 2 else 1000
SPACING = 100.0
REPS = 3

useful = 4.0 * M * (2 * W) * N


def setup(seed, miss, B):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 3, size=(M, N), dtype=np.int8)
    if miss > 0:
        g[rng.random(g.shape) < miss] = -1
    pos = np.arange(1, M + 1, dtype=np.float64) * SPACING
    lo, hi, pos_ok = windows.window_bounds(pos, W * SPACING)
    blk_lo, blk_hi, band_k = windows.band_blocks(lo, hi, B, M // B)
    right_k = windows.right_band_blocks(blk_hi, B)
    pre = ld_int8.preprocess_int8(
        jnp.asarray(g), jnp.asarray(pos_ok), jnp.float32(0.01),
        n_samples=N, assume_no_missing=miss == 0)
    dom_ok = pre["usable"] & (pre["rstd"] > jnp.float32(1e-4))
    base = (pre["g"], pre["m"], pre["h"], ld_int8.stack_scalars(pre),
            jnp.asarray(lo), jnp.asarray(hi), pre["usable"], dom_ok,
            pre["add_sd_zero"])
    np.asarray(base[0][:2])  # force staging
    return base, jnp.asarray(blk_lo), jnp.asarray(blk_hi), band_k, right_k


def timed(dispatch, args_list):
    outs = [dispatch(a) for a in args_list[:1]]      # compile + warm
    [np.asarray(o) for o in outs]
    t0 = time.time()
    outs = [dispatch(a) for a in args_list[1:]]
    l2s = [np.asarray(o) for o in outs]
    dt = (time.time() - t0) / len(outs)
    for l2 in l2s:
        assert np.isfinite(l2).sum() > M * 0.9, np.isfinite(l2).sum()
    return dt


for miss in (0.0, 0.02):
    hm = miss > 0
    for B in (256, 512):
        sets = [setup(7 + r, miss, B) for r in range(REPS + 1)]
        band_k, right_k = sets[0][3], sets[0][4]

        def disp_xla(s):
            base, blk_lo, blk_hi = s[0], s[1], s[2]
            return ld_int8.ld_scores_int8_sym(
                *base, blk_lo, blk_hi, jnp.float32(1e-4), block_size=B,
                band_k=band_k, right_k=right_k, n_samples=N,
                has_missing=hm, dot_dtype="int8")[0]

        dt = timed(disp_xla, sets)
        print(f"miss={miss:4.2f} xla-sym  B={B:4d}          : {dt:6.3f}s "
              f"{M/dt:9,.0f} SNPs/s {useful/dt/1e12:6.1f} TF/s", flush=True)

        for nc in (1024, 2048):
            for dd in ("int8", "bf16"):
                def disp_pal(s):
                    return ld_pallas_sym.ld_scores_pallas_int8_sym(
                        *s[0], rsq_thr=1e-4, block_size=B, right_k=right_k,
                        n_samples=N, sample_chunk=nc, has_missing=hm,
                        dot_dtype=dd)[0]

                try:
                    dt = timed(disp_pal, sets)
                    print(f"miss={miss:4.2f} pal-sym  B={B:4d} nc={nc} "
                          f"{dd}: {dt:6.3f}s {M/dt:9,.0f} SNPs/s "
                          f"{useful/dt/1e12:6.1f} TF/s", flush=True)
                except Exception as e:
                    print(f"miss={miss:4.2f} pal-sym  B={B:4d} nc={nc} "
                          f"{dd}: FAILED {type(e).__name__}: "
                          f"{str(e)[:140]}", flush=True)
