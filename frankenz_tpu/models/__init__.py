"""Fitters: BruteForce, NearestNeighbors, manifold networks (SOM / GNG).

TPU-native rebuild of the reference's fitter layer (L4 in SURVEY.md:
bruteforce.py, knn.py, networks.py).
"""

from .bruteforce import BruteForce  # noqa: F401
from .knn import NearestNeighbors  # noqa: F401
from .networks import (  # noqa: F401
    GrowingNeuralGas,
    SelfOrganizingMap,
    _Network,
    learn_geometric,
    learn_harmonic,
    learn_linear,
    neighbor_gauss,
    neighbor_lorentz,
)
