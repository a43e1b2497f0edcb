"""PLINK IO round-trip and decoder tests."""

import numpy as np
import pytest

from nldsc_tpu.io.plink import (
    BedReader, PlinkDataset, decode_bed_bytes, encode_bed_bytes, write_plink,
)
from nldsc_tpu.core.errors import NLDSCDataError, NLDSCParameterError

from utils import random_genotypes


def test_encode_decode_roundtrip(rng):
    g = random_genotypes(rng, 37, 101, missing_rate=0.1)
    raw = encode_bed_bytes(g)
    assert raw.shape == (37, (101 + 3) // 4)
    back = decode_bed_bytes(raw, 101)
    np.testing.assert_array_equal(back, g)


def test_bed_reader_blocks(tmp_path, rng):
    g = random_genotypes(rng, 64, 50, missing_rate=0.05)
    prefix = write_plink(tmp_path / "toy", g)
    reader = BedReader(prefix + ".bed", n_snp=64, n_samples=50)
    np.testing.assert_array_equal(reader.read_all(), g)
    np.testing.assert_array_equal(reader.read_block(10, 7), g[10:17])
    np.testing.assert_array_equal(reader.read_block(63, 1), g[63:64])


def test_bad_magic(tmp_path):
    path = tmp_path / "bad.bed"
    path.write_bytes(b"\x00\x00\x00" + b"\x00" * 100)
    with pytest.raises(NLDSCDataError):
        BedReader(str(path), n_snp=4, n_samples=4)


def test_dataset_parse(tmp_path, rng):
    g = random_genotypes(rng, 16, 20)
    prefix = write_plink(tmp_path / "ds", g)
    for spec in (prefix, prefix + ".bed", prefix + ".bim"):
        ds = PlinkDataset.parse(spec)
        assert ds.n_snp == 16 and ds.n_samples == 20
    pos = ds.positions("bp")
    assert pos.dtype == np.float64 and len(pos) == 16
    assert (np.diff(pos) > 0).all()


def test_single_chromosome_enforced(tmp_path, rng):
    import pandas as pd

    g = random_genotypes(rng, 6, 10)
    prefix = write_plink(tmp_path / "multi", g)
    bim = pd.read_csv(prefix + ".bim", sep="\t", header=None)
    bim.iloc[3:, 0] = 21
    bim.to_csv(prefix + ".bim", sep="\t", header=False, index=False)
    with pytest.raises(NLDSCParameterError):
        PlinkDataset.parse(prefix)
