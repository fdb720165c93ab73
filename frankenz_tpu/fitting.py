"""Fitter facade — re-exports every fitter under one namespace.

Reference: `frankenz/fitting.py:25-30` (a pure facade over BruteForce,
NearestNeighbors, SelfOrganizingMap, GrowingNeuralGas).
"""

from .models import BruteForce, NearestNeighbors  # noqa: F401

__all__ = ["BruteForce", "NearestNeighbors"]
