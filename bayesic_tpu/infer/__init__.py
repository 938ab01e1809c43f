"""Inference backends: SVI, MCMC (HMC/NUTS), SMC (SURVEY.md §2.2)."""
