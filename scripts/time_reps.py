"""Disentangle per-pass kernel time from tunnel RTT: time the default
symmetric int8 engine at several REPS (async dispatches per fetch batch).

If dt/pass = K + RTT/REPS, the fit over REPS gives both K (true device
time) and the effective RTT.  Usage: python scripts/time_reps.py [M] [N] [W]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from nldsc_tpu.ld import ld_int8, windows

argv = [int(a) for a in sys.argv[1:]]
M = argv[0] if argv else 16384
N = argv[1] if len(argv) > 1 else 16384
W = argv[2] if len(argv) > 2 else 1000
B = 512
SPACING = 100.0

pos = np.arange(1, M + 1, dtype=np.float64) * SPACING
lo, hi, pos_ok = windows.window_bounds(pos, W * SPACING)
blk_lo, blk_hi, band_k = windows.band_blocks(lo, hi, B, M // B)
right_k = windows.right_band_blocks(blk_hi, B)
meta = (jnp.asarray(pos_ok), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(blk_lo), jnp.asarray(blk_hi))


@jax.jit
def gen(key):
    return jax.random.randint(key, (M, N), 0, 3, jnp.int8)


def dispatch(g_dev):
    pre = ld_int8.preprocess_int8(g_dev, meta[0], jnp.float32(0.01),
                                  n_samples=N, assume_no_missing=True)
    dom_ok = pre["usable"] & (pre["rstd"] > jnp.float32(1e-4))
    out = ld_int8.ld_scores_int8_sym(
        pre["g"], pre["m"], pre["h"], ld_int8.stack_scalars(pre),
        meta[1], meta[2], pre["usable"], dom_ok, pre["add_sd_zero"],
        meta[3], meta[4], jnp.float32(1e-4), block_size=B, band_k=band_k,
        right_k=right_k, n_samples=N, has_missing=False, dot_dtype="int8")
    return out[0]


keys = jax.random.split(jax.random.PRNGKey(3), 40)
gs = [gen(k) for k in keys]
np.asarray(gs[-1][:1, :1])     # force generation
np.asarray(dispatch(gs[0])[:4])  # compile + warm

ki = 1
for reps in (1, 2, 4, 8, 16):
    batch, ki = gs[ki:ki + reps], ki + reps
    t0 = time.time()
    outs = [dispatch(g) for g in batch]
    [np.asarray(o[:4]) for o in outs]
    dt = (time.time() - t0) / reps
    print(f"REPS={reps:2d}: {dt*1e3:7.1f} ms/pass  {M/dt:9,.0f} SNPs/s",
          flush=True)
