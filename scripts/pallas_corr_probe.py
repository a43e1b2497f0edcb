"""Pallas probe: split-corrections big launches with ONE g stream.

The r4 floor ablation showed every XLA formulation of the corrections'
big launches costs a full HBM re-stream of g AND h (2.4 GB at UKB-N).
This kernel streams g ONCE, derives h in-register (h = 2*min(g,1)), and
keeps the compact contaminated-row operand cat3 VMEM-RESIDENT across the
whole sweep (constant block index -> fetched once), computing both
  a = g @ cat3.T   (S, 3P)
  b = h @ cat2.T   (S, 2P)
in a single pass.  Ideal traffic ~1.28 GB vs the 2.4+ GB re-stream.

Correctness bar: dots are integer-exact (values <= 2 are exact in bf16;
f32 accumulation exact below 2^24), so outputs must EQUAL the XLA idot.

Usage: python scripts/pallas_corr_probe.py [M] [N] [P3] [BM]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = int(sys.argv[2]) if len(sys.argv) > 2 else 300032
P3 = int(sys.argv[3]) if len(sys.argv) > 3 else 288   # 3P, mult of 32
BM = int(sys.argv[4]) if len(sys.argv) > 4 else 32
N_PAD = -(-N // 128) * 128
P2 = (P3 // 3) * 2


def _pick_kc(n_pad):
    """Largest K-chunk <= ~48k lanes that divides n_pad, multiple of 128."""
    lanes = n_pad // 128
    best = 1
    for d in range(1, lanes + 1):
        if lanes % d == 0 and d * 128 <= 49152:
            best = d * 128
    return best


KC = _pick_kc(N_PAD)
NK = N_PAD // KC


def kernel(g_ref, cat_ref, a_ref, b_ref):
    # Mosaic (this toolchain) legalizes NO int8 elementwise ops (subi,
    # minsi, i1 relayouts all fail) but DOES convert int8->bf16 — so
    # cat stays int8-RESIDENT (41 MB, fetched once) and each K-chunk is
    # cast to bf16 transiently (full-width casts spilled 91 MB of
    # registers).  Exactness holds: codes {0,1,2} are exact in bf16,
    # h = g*(3-g) = 2*min(g,1) exactly on them, f32 accumulation exact
    # below 2^24.
    dims = (((1,), (1,)), ((), ()))

    def body(k, accs):
        aa, ab = accs
        sl = pl.ds(k * KC, KC)
        gs = g_ref[:, sl].astype(jnp.bfloat16)
        cs = cat_ref[:, sl].astype(jnp.bfloat16)
        hs = gs * (3.0 - gs)
        aa = aa + lax.dot_general(gs, cs, dims,
                                  preferred_element_type=jnp.float32)
        ab = ab + lax.dot_general(hs, cs[:P2], dims,
                                  preferred_element_type=jnp.float32)
        return aa, ab

    aa, ab = lax.fori_loop(
        0, NK, body, (jnp.zeros((a_ref.shape[0], P3), jnp.float32),
                      jnp.zeros((a_ref.shape[0], P2), jnp.float32)))
    a_ref[...] = aa
    b_ref[...] = ab


@jax.jit
def corr_pallas(g, cat):
    return pl.pallas_call(
        kernel,
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, N_PAD), lambda i: (i, 0)),
            pl.BlockSpec((P3, N_PAD), lambda i: (0, 0)),  # resident
        ],
        out_specs=[
            pl.BlockSpec((BM, P3), lambda i: (i, 0)),
            pl.BlockSpec((BM, P2), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, P3), jnp.float32),
            jax.ShapeDtypeStruct((M, P2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(g, cat)


@jax.jit
def corr_xla(g, cat):
    dims = (((1,), (1,)), ((), ()))
    h = jnp.where(g > 0, 2, 0).astype(jnp.int8)
    a = lax.dot_general(g, cat, dims, preferred_element_type=jnp.int32)
    b = lax.dot_general(h, cat[:P2], dims, preferred_element_type=jnp.int32)
    return a.astype(jnp.float32), b.astype(jnp.float32)


@jax.jit
def gen():
    k = jax.random.PRNGKey(0)
    g = jax.random.randint(k, (M, N_PAD), 0, 3, jnp.int8)
    cat = jax.random.randint(jax.random.fold_in(k, 1), (P3, N_PAD), 0, 3,
                             jnp.int8)
    return g, cat


g, cat = gen()
np.asarray(g[:1, :1])

# correctness first (device-reduced comparison; full fetch is tunnel-slow)
ap, bp = corr_pallas(g, cat)
ax, bx = corr_xla(g, cat)
da = float(jnp.abs(ap - ax).max())
db = float(jnp.abs(bp - bx).max())
print(f"max |pallas - xla|: a={da} b={db}")
assert da == 0.0 and db == 0.0, "kernel is not exact"


@jax.jit
def run_pallas(g, cat):
    a, b = corr_pallas(g, cat)
    return a.sum() + b.sum()


@jax.jit
def run_xla(g, cat):
    a, b = corr_xla(g, cat)
    return a.sum() + b.sum()


np.asarray(run_pallas(g, cat)); np.asarray(run_xla(g, cat))
best = {"pallas": 1e9, "xla": 1e9}
for _ in range(3):
    for nm, fn in (("pallas", run_pallas), ("xla", run_xla)):
        t0 = time.time()
        np.asarray(fn(g, cat))
        best[nm] = min(best[nm], time.time() - t0)

gb = M * N_PAD / 1e9
for nm, dt in best.items():
    print(f"{nm:7s}: {dt*1e3:8.2f} ms   ({gb/dt:6.1f} GB/s one-g-stream "
          f"equivalent)", flush=True)
