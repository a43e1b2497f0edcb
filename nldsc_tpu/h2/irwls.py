"""Iteratively re-weighted least squares (reference: ``nldsc/h2/irwls.py``).

Exactly two weight-update iterations (``irwls.py:113``), then a block
jackknife on the re-weighted system.  Weight normalization divides by the
weight sum (``reweigh``, ``irwls.py:12-41``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import jackknife as jk


def reweigh(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Multiply rows of x by w normalized to sum 1 (rejects w <= 0)."""
    if bool(jnp.any(w <= 0)):
        raise ValueError("Weights must be > 0")
    n, _ = x.shape
    if w.shape != (n, 1):
        raise ValueError(f"w has shape {w.shape}. w must have shape (n, 1).")
    return x * (w / jnp.sum(w))


@jax.jit
def _wls_core(x, y, w):
    """Reweigh + solve as one compiled program (no w>0 validation — the
    caller's weight functions clip/guard; ``wls`` keeps the check for
    direct use).  Dtype dispatch is trace-static."""
    xw = x * (w / jnp.sum(w))
    yw = y * (w / jnp.sum(w))
    if xw.dtype == jnp.float32:
        return jk.solve_posdef(xw.T @ xw, xw.T @ yw)
    return jnp.linalg.lstsq(xw, yw)[0]


def wls(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted least squares; returns the coefficient column (p, 1).

    f64 (the default CPU path) uses QR ``lstsq`` like the reference; f32
    (the on-device path) solves the normal equations with the
    decomposition-free closed form instead — accelerator backends may
    lack fast small-matrix QR (on the axon dev runtime the remote QR
    compile took ~20 min), and the 2–3-column LD-score systems are
    well-conditioned enough that the difference vs QR is below the
    on-device parity tolerance (tests/test_h2_ondevice.py).
    """
    if bool(jnp.any(w <= 0)):
        raise ValueError("Weights must be > 0")
    return _wls_core(x, y, w)


def irwls(x: jnp.ndarray, y: jnp.ndarray, update_func, n_blocks: int,
          w: jnp.ndarray, slow: bool = False, separators=None,
          n_iter: int = 2) -> jk.JackknifeResult:
    """IRWLS driver (irwls.py:75-130).

    ``update_func`` maps the current WLS coefficient column (p, 1) to new
    (unsquare-rooted) weights; it runs exactly ``n_iter`` times (reference
    hardcodes 2).  The returned jackknife uses the final sqrt-weights.
    """
    n, _ = x.shape
    if y.shape != (n, 1):
        raise ValueError(f"y has shape {y.shape}. y must have shape ({n}, 1).")
    w = jnp.ones_like(y) if w is None else w
    if w.shape != (n, 1):
        raise ValueError(f"w has shape {w.shape}. w must have shape ({n}, 1).")

    w = jnp.sqrt(w)
    for _ in range(n_iter):
        coef = wls(x, y, w)
        new_w = jnp.sqrt(update_func(coef))
        if new_w.shape != w.shape:
            raise ValueError("New weights must have same shape.")
        w = new_w

    xw = reweigh(x, w)
    yw = reweigh(y, w)
    if slow:
        return jk.lstsq_jackknife_slow(xw, yw, n_blocks, separators=separators)
    return jk.lstsq_jackknife_fast(xw, yw, n_blocks, separators=separators)
