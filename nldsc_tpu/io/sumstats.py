"""GWAS summary-statistics reader (reference: ``nldsc/h2/common.py:29-66``).

Whitespace-delimited with columns ``SNP Z N`` (+ optional ``A1 A2``),
``.`` = NA, compression sniffed from the extension; drops NA rows and
duplicate rs numbers.
"""

from __future__ import annotations

import pandas as pd

from ..core.logging import log


def read_sumstats(path: str, alleles: bool = False,
                  dropna: bool = True) -> pd.DataFrame:
    # compression: pandas' "infer" handles every extension the reference's
    # sniffer recognized (the reference passed the raw extension to pandas,
    # which modern pandas rejects — a latent bug there)
    columns = ["SNP", "Z", "N"] + (["A1", "A2"] if alleles else [])
    dtypes = {"SNP": str, "Z": float, "N": float, "A1": str, "A2": str}
    data = pd.read_csv(
        path, sep=r"\s+", na_values=".", usecols=columns,
        dtype={k: v for k, v in dtypes.items() if k in columns},
        compression="infer",
    )
    if dropna:
        data = data.dropna(how="any")
    n_snp = len(data)
    data = data.drop_duplicates(subset="SNP")
    if n_snp > len(data):
        log.info("Dropped %d SNPs with duplicated rs numbers.", n_snp - len(data))
    return data.reset_index(drop=True)
