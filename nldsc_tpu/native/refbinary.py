"""ctypes loader for the EXECUTED reference LD kernel.

``libref_ldscore.so`` is the reference's own C++ ``calculate()``
(/root/reference/nldsc/ldscore/_ldscore/ldscalc.h:8-65) compiled read-only
from the mounted reference tree against the Armadillo-subset shim in
``refshim/``.  It exists purely as a parity oracle: the semantics the
float64 oracle *interprets* (PARITY.md) are here *executed*.

Build on demand: :func:`available` attempts ``make ref`` when the shared
library is missing and the reference tree is mounted; tests skip cleanly
when neither is possible.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libref_ldscore.so")
_REF_DIR = os.environ.get(
    "NLDSC_REF_DIR", "/root/reference/nldsc/ldscore/_ldscore")
_lib = None
_build_attempted = False


def _try_build() -> None:
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    if not os.path.isdir(_REF_DIR):
        return
    try:
        subprocess.run(
            ["make", "ref", f"REF_DIR={_REF_DIR}"],
            cwd=_DIR, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, OSError):
        pass


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            _try_build()
        if os.path.exists(_LIB_PATH):
            lib = ctypes.CDLL(_LIB_PATH)
            dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.nldsc_ref_calculate.restype = ctypes.c_int
            lib.nldsc_ref_calculate.argtypes = [
                ctypes.c_char_p,                 # bedfile
                ctypes.c_int, ctypes.c_int,      # n_snp, n_org
                ctypes.c_double,                 # ld_wind
                ctypes.c_double, ctypes.c_double, ctypes.c_double,  # thresholds
                dp,                              # positions
                dp, dp, dp, dp,                  # l2, l2d, maf, rstd
                ip, ip, ip,                      # l2_ws, l2d_ws, l2d_wse
                ctypes.c_char_p, ctypes.c_int,   # errbuf
            ]
            _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def calculate_reference(bedfile: str, n_snp: int, n_org: int,
                        ld_wind: float, maf: float, std_thr: float,
                        rsq_thr: float, positions: np.ndarray) -> dict:
    """Run the reference's executed C++ ``calculate()`` on a .bed file.

    Returns the seven LDScoreResult vectors (data.h:21-31) as arrays.

    Caveat inherited from the reference: ``mafs()``/``residual_stds()``
    index the sliding cache for every SNP (stream.h:165-179), but the
    cache only grows while pivots are *used* — trailing negative-position
    sentinel SNPs leave it short and the reference reads uninitialized
    memory (UB in the original too).  Test datasets therefore always end
    with a used SNP.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libref_ldscore.so unavailable (reference tree "
                           "not mounted or build failed)")
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    if positions.shape != (n_snp,):
        raise ValueError("positions must have shape (n_snp,)")
    l2 = np.empty(n_snp, np.float64)
    l2d = np.empty(n_snp, np.float64)
    maf_out = np.empty(n_snp, np.float64)
    rstd = np.empty(n_snp, np.float64)
    l2_ws = np.empty(n_snp, np.int32)
    l2d_ws = np.empty(n_snp, np.int32)
    l2d_wse = np.empty(n_snp, np.int32)
    err = ctypes.create_string_buffer(512)
    rc = lib.nldsc_ref_calculate(
        bedfile.encode(), n_snp, n_org, ld_wind, maf, std_thr, rsq_thr,
        positions, l2, l2d, maf_out, rstd, l2_ws, l2d_ws, l2d_wse,
        err, len(err))
    if rc != 0:
        raise RuntimeError(
            f"reference calculate() failed: {err.value.decode(errors='replace')}")
    return {
        "l2": l2, "l2d": l2d, "maf": maf_out, "residuals_std": rstd,
        "l2_ws": l2_ws, "l2d_ws": l2d_ws, "l2d_wse": l2d_wse,
    }
