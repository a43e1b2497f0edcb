"""Does JAX's persistent compilation cache work through the axon runtime?

VERDICT r4 item 2: fresh-process genome-scale wall-clock is dominated by
remote compiles (~300+ s for ~1 s of device compute) and the repo never
tried `jax_compilation_cache_dir`.  This probe answers the question
directly: run the SAME distinctive kernel in two fresh processes with the
cache enabled and compare first-call (compile) wall-clock.

Usage:  python scripts/probe_compile_cache.py <cache_dir> <seed>
Prints one JSON line: {"compile_s": ..., "cache_entries": N}.
Run once with an empty dir (cold), once more (should be warm if the cache
engages through the axon PJRT client).
"""
import json
import os
import sys
import time

cache_dir = sys.argv[1]
seed = int(sys.argv[2])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np


@jax.jit
def kernel(x, y):
    # Distinctive enough not to collide with anything else ever compiled:
    # chained int8 matmuls + odd elementwise epilogue, unusual shape.
    acc = jnp.zeros((1536, 1536), jnp.int32)
    for _ in range(3):
        acc = acc + jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        x = (x + jnp.int8(1)).astype(jnp.int8)
    return jnp.float32(acc).sum() * jnp.float32(1.0000173)


rng = np.random.default_rng(seed)
x = jnp.asarray(rng.integers(-3, 3, (1536, 2048), dtype=np.int8))
y = jnp.asarray(rng.integers(-3, 3, (2048, 1536), dtype=np.int8))
np.asarray(x[:1, :1]); np.asarray(y[:1, :1])

t0 = time.time()
out = float(np.asarray(kernel(x, y)))
compile_s = time.time() - t0

entries = []
for root, _, files in os.walk(cache_dir):
    entries.extend(files)
print(json.dumps({"compile_s": round(compile_s, 2), "out": out,
                  "cache_entries": len(entries)}))
