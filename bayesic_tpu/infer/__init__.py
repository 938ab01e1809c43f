"""Inference backends: SVI, MCMC (HMC/NUTS), SMC (SURVEY.md §2.2)."""

from .loglik import log_likelihood
from .predictive import Predictive

__all__ = ["Predictive", "log_likelihood"]
