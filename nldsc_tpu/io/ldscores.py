"""Reading/writing .L2 score tables and .M / .M_5_50 sidecars.

Output contract (SURVEY §2.4): tab-separated, ``%.5f`` floats, columns
``CHR SNP BP L2 L2D`` plus ``MAF WSA WSD WSDE RSTD`` with ``--extra``
(reference ``nldsc/ldscore/routine.py:32-48,97-100``).

Unlike the reference — which *promises* a .M file but never writes one
(SURVEY Q8) — we write both ``.M`` (all usable SNPs) and ``.M_5_50``
(usable SNPs with MAF > 5%, the standard LDSC convention).  ``MD`` uses the
reference's de-facto estimator ``M * mean(WSDE / WSA)``
(``nldsc/h2/common.py:128-131``) restricted to the same SNP set.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from ..core.logging import log

L2_COLUMNS = ["CHR", "SNP", "BP", "L2", "L2D"]
EXTRA_COLUMNS = ["MAF", "WSA", "WSD", "WSDE", "RSTD"]


def make_output(bim: pd.DataFrame, result: dict, extra: bool = False) -> pd.DataFrame:
    """Assemble the .L2 DataFrame (reference make_output, routine.py:32-48)."""
    data = {
        "CHR": bim["CHR"].to_numpy(),
        "SNP": bim["SNP"].to_numpy(),
        "BP": bim["BP"].to_numpy(),
        "L2": result["l2"],
        "L2D": result["l2d"],
    }
    if extra:
        data["MAF"] = result["maf"]
        data["WSA"] = result["l2_ws"]
        data["WSD"] = result["l2d_ws"]
        data["WSDE"] = result["l2d_wse"]
        data["RSTD"] = result["residuals_std"]
    return pd.DataFrame(data)


def write_l2(df: pd.DataFrame, out: str) -> None:
    df.to_csv(out, sep="\t", index=False, float_format="%.5f")
    log.info("Wrote LD scores: %s", out)


def m_counts(result: dict, maf_floor: float | None = None) -> tuple[int, int]:
    """(M, MD) over usable SNPs, optionally restricted to MAF > maf_floor."""
    l2 = np.asarray(result["l2"], dtype=np.float64)
    maf = np.asarray(result["maf"], dtype=np.float64)
    wsa = np.asarray(result["l2_ws"], dtype=np.float64)
    wsde = np.asarray(result["l2d_wse"], dtype=np.float64)
    sel = ~np.isnan(l2)
    if maf_floor is not None:
        sel &= maf > maf_floor
    m = int(sel.sum())
    if m == 0:
        return 0, 0
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = wsde[sel] / wsa[sel]
    md = m * float(np.nanmean(ratio)) if np.isfinite(ratio).any() else 0.0
    return m, int(md)


def write_m_files(result: dict, l2_path: str) -> None:
    """Write .M and .M_5_50 siblings of the .L2 file (fixes quirk Q8).

    Uses ``with_suffix`` naming so the h2 reader's sidecar resolution
    (``path.with_suffix('.M')``, reference common.py:119-127) finds them.
    """
    base = Path(l2_path)
    for suffix, floor in ((".M", None), (".M_5_50", 0.05)):
        m, md = m_counts(result, floor)
        pd.DataFrame({"M": [m], "MD": [md]}).to_csv(
            base.with_suffix(suffix), sep="\t", index=False)
    log.info("Wrote SNP counts: %s / %s",
             base.with_suffix(".M"), base.with_suffix(".M_5_50"))


def read_m(path: str) -> tuple[int, int]:
    m = pd.read_csv(path, sep="\t")
    return int(m["M"].iloc[0]), int(m["MD"].iloc[0])


def read_l2_file(path: str) -> pd.DataFrame:
    """One .L2 table, sorted by CHR,BP (SEs depend on it — common.py:137)."""
    score = pd.read_csv(path, sep="\t")
    score = score.sort_values(by=["CHR", "BP"])
    score = score.dropna().drop_duplicates(subset="SNP")
    return score


def read_ld_scores(path: str, use_m: bool = False) -> tuple[pd.DataFrame, int, int]:
    """File-or-directory LD score reader (reference LDScoreReader).

    Returns (scores, M, MD).  M/MD resolution per reference
    ``nldsc/h2/common.py:119-131``: prefer the requested sidecar
    (.M with ``use_m`` else .M_5_50, falling back to .M), else derive
    ``M = #rows``, ``MD = M * mean(WSDE/WSA)`` — which requires the
    ``--extra`` columns in the .L2 file.
    """
    p = Path(path)
    if p.is_dir():
        frames, m_tot, md_tot = [], 0, 0
        files = sorted(p.glob("*.L2"))
        if not files:
            raise FileNotFoundError(f"no *.L2 files in directory {path}")
        for f in files:
            score, m, md = _read_one(f, use_m)
            frames.append(score[L2_COLUMNS])
            m_tot += m
            md_tot += md
        scores = pd.concat(frames, axis=0).reset_index(drop=True)
        scores = scores.sort_values(by=["CHR", "BP"])
        return scores, m_tot, md_tot
    return _read_one(p, use_m)


def _read_one(path: Path, use_m: bool) -> tuple[pd.DataFrame, int, int]:
    suffix = ".M" if use_m else ".M_5_50"
    sidecar = path.with_suffix(suffix)
    if not sidecar.exists() and not use_m:
        sidecar = path.with_suffix(".M")
    score = read_l2_file(str(path))
    if sidecar.exists():
        m, md = read_m(str(sidecar))
    else:
        if "WSDE" not in score.columns or "WSA" not in score.columns:
            raise ValueError(
                f"no .M/.M_5_50 sidecar for {path} and the .L2 lacks the "
                "--extra columns needed for the M/MD fallback"
            )
        m = len(score["L2"])
        md = int(m * (score["WSDE"] / score["WSA"]).mean())
    return score, m, int(md)
