"""Fitter facade — re-exports every fitter under one namespace.

Reference: `frankenz/fitting.py:25-30` (a pure facade over BruteForce,
NearestNeighbors, SelfOrganizingMap, GrowingNeuralGas).
"""

from .models import (  # noqa: F401
    BruteForce,
    GrowingNeuralGas,
    NearestNeighbors,
    SelfOrganizingMap,
)

__all__ = ["BruteForce", "NearestNeighbors", "SelfOrganizingMap",
           "GrowingNeuralGas"]
