"""Microbenchmark: int4 vs int8 vs bf16 MXU contraction rate on the chip.

The LD engines' flop ceiling is the integer matmul rate; genotype
operands {0,1,2}, missing indicators {0,1} and dominant codes {0,2} all
fit in int4, and every partial sum stays < 2^24, so an int4 contraction
would be EXACT.  If the MXU runs int4 at 2x the int8 rate, both the
clean (3-matmul) and missing (8-matmul) symmetric paths double.

Protocol per dtype: ONE jitted dispatch scanning STEPS passes over a
REPS-batched (B x N) @ (N x W) contraction; each pass perturbs the left
operand by the step index (defeats CSE/memoization), so the dispatch
holds STEPS*REPS distinct tile matmuls — enough work to swamp the
~33 ms tunnel RTT.  Operands are staged as int8 and cast in-kernel
(the tunnel cannot stage s4 arrays).  Reports Tops/s.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

B, W, N = 512, 1536, 16384
REPS = 16
STEPS = 24


def bench(dtype_name: str) -> float:
    if dtype_name == "int4":
        dt, acc = jnp.int4, jnp.int32
    elif dtype_name == "int8":
        dt, acc = jnp.int8, jnp.int32
    else:
        dt, acc = jnp.bfloat16, jnp.float32

    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 2)
        x = jax.random.randint(ks[0], (REPS, B, N), 0, 3, jnp.int8)
        y = jax.random.randint(ks[1], (REPS, W, N), 0, 3, jnp.int8)
        return x, y

    dims = (((2,), (2,)), ((0,), (0,)))

    @jax.jit
    def run(x, y):
        yc = y.astype(dt)

        def step(carry, i):
            xi = ((x + i.astype(jnp.int8)) % 3).astype(dt)
            out = lax.dot_general(xi, yc, dims, preferred_element_type=acc)
            return carry + out[:, 0, 0].astype(jnp.float32), None

        z0 = jnp.zeros(REPS, jnp.float32)
        z, _ = lax.scan(step, z0, jnp.arange(STEPS, dtype=jnp.int32))
        return jnp.sum(z)

    x, y = gen(key)
    x2, y2 = gen(jax.random.PRNGKey(1))
    np.asarray(run(x, y))                      # compile + warm
    t0 = time.time()
    np.asarray(run(x2, y2))                    # timed
    dt_s = time.time() - t0
    macs = STEPS * REPS * B * W * N
    return 2 * macs / dt_s / 1e12


if __name__ == "__main__":
    for name in sys.argv[1:] or ["int8", "int4", "bf16"]:
        try:
            rate = bench(name)
            print(f"{name}: {rate:.1f} Tops/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED ({type(e).__name__}: {e})")
