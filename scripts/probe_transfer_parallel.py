"""Does issuing host->device puts CONCURRENTLY beat sequential on the
tunneled runtime?

The in-core ingestion path (`pipeline._staged_put`) issues 64 MB chunk
puts sequentially; the e2e decomposition shows transfer dominating
(1.79 s of a 2.36 s chr-scale run).  If the tunnel pipelines multiple
in-flight puts, a thread fan-out is a free win; if it serializes (one
TCP relay), this probe documents why _staged_put stays sequential.

Usage: python scripts/probe_transfer_parallel.py [CHUNK_MB] [N_CHUNKS]
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 64
NC = int(sys.argv[2]) if len(sys.argv) > 2 else 6

rng = np.random.default_rng(1)
chunks_a = [rng.integers(0, 3, (MB << 20,), dtype=np.int8)
            for _ in range(NC)]
chunks_b = [rng.integers(0, 3, (MB << 20,), dtype=np.int8)
            for _ in range(NC)]
chunks_c = [rng.integers(0, 3, (MB << 20,), dtype=np.int8)
            for _ in range(NC)]


def put_all(chunks):
    devs = [jnp.asarray(c) for c in chunks]
    for d in devs:
        d.block_until_ready()
    # force real completion: fetch one byte of each
    for d in devs:
        np.asarray(d[:1])
    return devs


def put_parallel(chunks, workers):
    with ThreadPoolExecutor(max_workers=workers) as ex:
        devs = list(ex.map(lambda c: jnp.asarray(c), chunks))
    for d in devs:
        np.asarray(d[:1])
    return devs


# warm the runtime path with distinct data (memoization)
put_all(chunks_a)

t0 = time.time()
put_all(chunks_b)
seq = time.time() - t0
print(f"sequential : {NC}x{MB} MB in {seq:.2f}s "
      f"({NC * MB / seq:.0f} MB/s)", flush=True)

t0 = time.time()
put_parallel(chunks_c, workers=4)
par = time.time() - t0
print(f"parallel(4): {NC}x{MB} MB in {par:.2f}s "
      f"({NC * MB / par:.0f} MB/s)", flush=True)
