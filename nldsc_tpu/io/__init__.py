from .plink import PlinkDataset, BedReader, read_bim, read_fam, write_plink

__all__ = ["PlinkDataset", "BedReader", "read_bim", "read_fam", "write_plink"]
