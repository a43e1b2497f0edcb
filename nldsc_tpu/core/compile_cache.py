"""Persistent XLA compilation cache (on by default for every entry point).

Why this exists: on the remote-compile runtime this framework targets,
every fresh process re-compiles every program it dispatches — measured
(PERFORMANCE.md "Whole-genome demonstration"): `ld-genome` over 20
chromosomes spent 300-1000 s compiling for ~20 s of device work, a
fresh-process on-device h2 pays 88 separate compiles (~90-115 s), and
the remote compiler caches NOTHING across processes.  JAX's designed-for-
exactly-this lever is the persistent on-disk compilation cache
(`jax_compilation_cache_dir`), keyed on the computation fingerprint +
jaxlib/backend versions, so it is correctness-neutral by construction.
Probed through this runtime (`scripts/probe_compile_cache.py`): a 7.2 s
cold remote compile is a 0.17 s cache hit in the next process.

The reference has no analog (its C++ kernel is ahead-of-time compiled;
its Python is interpreted — compilation latency is a TPU/XLA-specific
cost, so removing it is part of matching the reference's UX).

Opt-out: set ``NLDSC_NO_COMPILE_CACHE=1``.
Relocate: set ``NLDSC_COMPILE_CACHE=/path/to/dir``.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache() -> str | None:
    """Idempotently point JAX at the on-disk compilation cache.

    Returns the cache directory, or None when opted out or unavailable.
    Safe to call before or after backend initialization (the config is
    consulted at each compile).  The 0.75 s compile-time threshold is
    deliberate: every REMOTE compile (the actual pain — each costs ≥1 s
    of compiler-service round-trip, big kernels minutes) clears it,
    while local XLA:CPU jits (milliseconds to recompile) stay out of
    the cache — persisted CPU executables are machine-feature-stamped
    and reload with a scary-but-benign `cpu_aot_loader` feature-mismatch
    ERROR line per entry (measured: 32 such lines on one h2 run when
    everything was cached), and caching them buys nothing.
    """
    global _enabled
    if os.environ.get("NLDSC_NO_COMPILE_CACHE"):
        return None
    path = os.environ.get(
        "NLDSC_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "nldsc_tpu",
                     "jax-cache"))
    if _enabled:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get("NLDSC_CACHE_MIN_COMPILE_SECS", "0.75")))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is a pure optimization
        return None
    _enabled = True
    return path


def cache_everything() -> None:
    """Drop the persistence threshold to 0 for this process.

    For flows made of many scattered eager ops on the accelerator
    (on-device h2: ~88 compiles, each ~1 s of remote round-trip but
    reporting under the 0.75 s threshold) — there the CPU-reload-noise
    rationale for the threshold doesn't apply and caching every entry
    is pure win.  No-op when the cache is disabled."""
    if not _enabled:
        return
    try:
        import jax

        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:  # pragma: no cover
        pass
