"""Operators and jitted compute kernels (the TPU hot path)."""
from .operators import (AbstractOperator, CallableOperator, DenseOperator,
                        DiagonalOperator, GroupedSoPOperator,
                        SumOfProductOperator, as_operator)
from .sparse import BandedOperator, BSROperator
from . import linear_solvers

__all__ = ["AbstractOperator", "CallableOperator", "DenseOperator",
           "DiagonalOperator", "GroupedSoPOperator", "SumOfProductOperator",
           "BSROperator", "BandedOperator",
           "as_operator", "linear_solvers"]
