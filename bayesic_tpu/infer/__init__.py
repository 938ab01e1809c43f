"""Inference backends: SVI, MCMC (HMC/NUTS), SMC (SURVEY.md §2.2)."""

from .predictive import Predictive

__all__ = ["Predictive"]
