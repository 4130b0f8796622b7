from .sparse import SymCOO, ConstraintOp, pair_dots, gather_cols, scatter_cols
from .eigs import dual_certificate, CertResult

__all__ = [
    "SymCOO", "ConstraintOp", "pair_dots", "gather_cols", "scatter_cols",
    "dual_certificate", "CertResult",
]
