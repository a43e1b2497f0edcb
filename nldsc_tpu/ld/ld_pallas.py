"""Fused Pallas LD kernel (placeholder — currently delegates to the XLA path).

Will be replaced by a pallas_call kernel fusing the N-chunked matmul
accumulation with the adjusted-r²/mask/row-sum epilogue.
"""

from .ld_xla import ld_scores_xla as ld_scores_pallas  # noqa: F401
