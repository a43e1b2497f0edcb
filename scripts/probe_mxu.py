"""Pin the chip's attainable MXU rates for the dtypes the LD engines use.

Method: ONE jit call containing Q dependency-CHAINED matmuls (each input
derived from the previous output, so nothing can be elided or overlapped
with the fetch), one scalar fetch.  dt = Q·matmul + 1 RTT; with Q=32 the
RTT is noise.  Inputs are generated on device (host staging through the
tunnel would dominate otherwise).

Usage: python scripts/probe_mxu.py [S] [Q]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

S = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 32

dims = (((1,), (0,)), ((), ()))


def probe(name, dtype, pref, precision=None):
    def cast_codes(v):
        # keep values in {0,1,2} so every dtype is exact
        return (v % 3).astype(dtype)

    @jax.jit
    def chain(x0, y):
        x = x0
        acc = None
        for _ in range(Q):
            kw = {"precision": precision} if precision else {}
            acc = lax.dot_general(x, y, dims, preferred_element_type=pref,
                                  **kw)
            x = cast_codes(acc)              # dependency: no overlap/elide
        return acc[0, 0]

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    gen = lambda k: cast_codes(jax.random.randint(k, (S, S), 0, 3, jnp.int32))  # noqa: E731
    x_w, x_t, y = gen(k1), gen(k2), gen(k3)
    np.asarray(chain(x_w, y))                # compile + warm (distinct data)
    t0 = time.time()
    np.asarray(chain(x_t, y))
    dt = (time.time() - t0) / Q
    print(f"{name:28s}: {dt*1e3:7.2f} ms/matmul  {2.0*S**3/dt/1e12:7.1f} "
          f"Tops/s", flush=True)


probe("int8 x int8 -> int32", jnp.int8, jnp.int32)
probe("bf16 x bf16 -> f32", jnp.bfloat16, jnp.float32)
probe("f32 default (1-pass bf16)", jnp.float32, jnp.float32,
      precision="default")
probe("f32 highest (multi-pass)", jnp.float32, jnp.float32,
      precision="highest")


def probe_nt(name, dtype, pref):
    """Same chained probe but contracting axis 1 of BOTH operands (the
    x @ y.T layout every LD engine uses) — detects transpose penalties."""
    dims_nt = (((1,), (1,)), ((), ()))

    def cast_codes(v):
        return (v % 3).astype(dtype)

    @jax.jit
    def chain(x0, y):
        x = x0
        acc = None
        for _ in range(Q):
            acc = lax.dot_general(x, y, dims_nt,
                                  preferred_element_type=pref)
            x = cast_codes(acc)
        return acc[0, 0]

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(12), 3)
    gen = lambda k: cast_codes(jax.random.randint(k, (S, S), 0, 3, jnp.int32))  # noqa: E731
    x_w, x_t, y = gen(k1), gen(k2), gen(k3)
    np.asarray(chain(x_w, y))
    t0 = time.time()
    np.asarray(chain(x_t, y))
    dt = (time.time() - t0) / Q
    print(f"{name:28s}: {dt*1e3:7.2f} ms/matmul  {2.0*S**3/dt/1e12:7.1f} "
          f"Tops/s", flush=True)


probe_nt("int8 NT (x @ y.T)", jnp.int8, jnp.int32)
probe_nt("bf16 NT (x @ y.T)", jnp.bfloat16, jnp.float32)


def probe_int4():
    """int4×int4→int32: if native on this MXU, it doubles the int8 rate
    (genotype codes fit in 4 bits)."""
    def cast4(v):
        return (v % 3).astype(jnp.int4)

    @jax.jit
    def chain(x0, y):
        x = x0
        acc = None
        for _ in range(Q):
            acc = lax.dot_general(x, y, dims,
                                  preferred_element_type=jnp.int32)
            x = cast4(acc)
        return acc[0, 0]

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(13), 3)
    gen4 = lambda k: cast4(jax.random.randint(k, (S, S), 0, 3, jnp.int32))  # noqa: E731
    x_w, x_t, y = gen4(k1), gen4(k2), gen4(k3)
    np.asarray(chain(x_w, y))
    t0 = time.time()
    np.asarray(chain(x_t, y))
    dt = (time.time() - t0) / Q
    print(f"{'int4 x int4 -> int32':28s}: {dt*1e3:7.2f} ms/matmul  "
          f"{2.0*S**3/dt/1e12:7.1f} Tops/s", flush=True)


if "--int4" in sys.argv:
    try:
        probe_int4()
    except Exception as e:  # int4 matmul is NOT supported on v5e
        print(f"int4 x int4 -> int32        : unsupported "
              f"({type(e).__name__})", flush=True)
