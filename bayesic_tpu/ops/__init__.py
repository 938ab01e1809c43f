"""Pallas TPU kernel tier with jnp fallbacks (SURVEY.md C14).

Every kernel is gated by the BAYESIC_PALLAS env flag:
  auto (default) - Pallas on TPU, jnp fallback elsewhere
  1              - force Pallas (interpret mode off-TPU)
  0              - force jnp fallbacks
  interpret      - Pallas interpreter everywhere (kernel-logic testing)
"""

from .gather import gather_reference, mxu_gather
from .gmm_logprob import gmm_loglik, gmm_loglik_reference
from .leapfrog import kick, kick_drift, kick_drift_reference, kick_reference

__all__ = [
    "gmm_loglik", "gmm_loglik_reference",
    "mxu_gather", "gather_reference",
    "kick_drift", "kick", "kick_drift_reference", "kick_reference",
]
