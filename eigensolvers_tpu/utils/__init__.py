"""Shared numerics, quadrature, units, reporting, status, checkpointing."""
