"""Inference backends: SVI, MCMC (HMC/NUTS), SMC (SURVEY.md §2.2)."""

from .laplace import Laplace, map_estimate
from .loglik import log_likelihood
from .predictive import Predictive

__all__ = ["Laplace", "Predictive", "log_likelihood", "map_estimate"]
