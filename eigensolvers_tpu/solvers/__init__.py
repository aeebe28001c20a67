"""Eigensolver algorithms (backend-generic via the AbstractVector contract)."""
from .lanczos import inexactLanczosDiagonalization
from .feast import feastDiagonalization

__all__ = ["inexactLanczosDiagonalization", "feastDiagonalization"]
