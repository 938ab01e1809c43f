"""Inference backends: SVI, MCMC (HMC/NUTS), SMC (SURVEY.md §2.2)."""

from .discrete import infer_discrete
from .laplace import Laplace, map_estimate
from .pathfinder import PathfinderResult, pathfinder
from .sgmcmc import SGMCMC, SGMCMCResult
from .svgd import SVGD, SVGDResult
from .loglik import log_likelihood
from .predictive import Predictive

__all__ = ["Laplace", "PathfinderResult", "Predictive", "SGMCMC",
           "SGMCMCResult", "SVGD", "SVGDResult", "infer_discrete",
           "log_likelihood", "map_estimate", "pathfinder"]
