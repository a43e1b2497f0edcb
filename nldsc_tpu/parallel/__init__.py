from .mesh import snp_mesh
from .sharded import ld_scores_sharded

__all__ = ["snp_mesh", "ld_scores_sharded"]
