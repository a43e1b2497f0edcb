from .mesh import snp_mesh
from .sharded import ld_scores_sharded
from .sample_sharded import ld_scores_sample_sharded

__all__ = ["snp_mesh", "ld_scores_sharded", "ld_scores_sample_sharded"]
