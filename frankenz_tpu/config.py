"""
Dataclass configuration with the reference's embedded defaults.

The reference has no config system — every default lives inline in ~15
function signatures (SURVEY.md section 5: `wt_thresh=1e-3`,
`cdf_thresh=2e-4`, kNN `K=25`/`k=20`, SOM/GNG hyper-parameters, and the
`simulate.py:26-48` preset dicts).  These dataclasses collect them in one
place; fitters accept plain kwargs as before, and `.asdict()` splats a
config into any fitter call.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

__all__ = ["ThresholdConfig", "LikelihoodConfig", "KNNConfig", "SOMConfig",
           "GNGConfig", "PopulationSamplerConfig",
           "HierarchicalSamplerConfig", "BatchConfig"]


class _AsDict:
    def asdict(self):
        return dataclasses.asdict(self)

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


@dataclass(frozen=True)
class ThresholdConfig(_AsDict):
    """Weight-thresholding defaults (pdf.py:508-516 and throughout)."""

    wt_thresh: float | None = 1e-3
    cdf_thresh: float | None = 2e-4


@dataclass(frozen=True)
class LikelihoodConfig(_AsDict):
    """`loglike`/`logprob` flags (pdf.py:238-323)."""

    free_scale: bool = False
    ignore_model_err: bool = False
    dim_prior: bool = True
    ltol: float = 1e-4
    return_scale: bool = False


@dataclass(frozen=True)
class KNNConfig(_AsDict):
    """KMCkNN defaults (knn.py:40, :190)."""

    K: int = 25
    k: int = 20
    feature_map: str = "luptitude"
    lp_norm: int = 2
    leafsize: int = 50  # accepted for API parity; no trees are built


@dataclass(frozen=True)
class SOMConfig(_AsDict):
    """SelfOrganizingMap training defaults (networks.py:1517-1519)."""

    nside: int = 50
    nproj: int = 2
    niter: int = 2000
    nbatch: int = 50
    wt_thresh: float | None = 1e-3
    cdf_thresh: float | None = 2e-4
    track_scale: bool = False


@dataclass(frozen=True)
class GNGConfig(_AsDict):
    """GrowingNeuralGas training defaults (networks.py:1898-1902)."""

    niter: int = 5000
    nbatch: int = 50
    max_nodes: int = 2500
    max_age: int = 15
    learn_best: float = 0.2
    learn_neighbor: float = 0.005
    new_err_dec: float = 0.5
    all_err_dec: float = 0.005
    track_scale: bool = False


@dataclass(frozen=True)
class PopulationSamplerConfig(_AsDict):
    """population_sampler.run_mcmc defaults (samplers.py:118-120)."""

    thin: int = 400
    mh_steps: int = 3
    nchains: int = 1


@dataclass(frozen=True)
class HierarchicalSamplerConfig(_AsDict):
    """hierarchical_sampler.run_mcmc defaults (samplers.py:349-351)."""

    thin: int = 5
    nchains: int = 1


@dataclass(frozen=True)
class BatchConfig(_AsDict):
    """TPU execution knobs (no reference counterpart)."""

    batch_size: int | None = None  # None -> sized from the model count
    grid_budget_elems: int = 1 << 26  # target (B, M) grid size
    synth_budget_bytes: int = 1 << 28  # flux-synthesis chunk budget
