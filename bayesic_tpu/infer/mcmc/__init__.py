"""MCMC backend: HMC / iterative multinomial NUTS with windowed adaptation
(SURVEY.md C8)."""

from .adapt import (
    DualAveragingState,
    WelfordState,
    build_schedule,
    da_init,
    da_update,
    find_reasonable_step_size,
    welford_finalize,
    welford_init,
    welford_update,
)
from .hmc import HMCInfo, make_hmc_kernel
from .integrators import IntegratorState, make_leapfrog
from .mcmc import MCMC, MCMCResult
from .metrics import kinetic_energy, sample_momentum, velocity
from .nuts import NUTSInfo, make_nuts_kernel
from .ess import EllipticalSlice, ESSResult
from .gibbs import DiscreteGibbs, GibbsResult
from .tempering import ParallelTempering, PTResult, geometric_ladder

__all__ = [
    "MCMC", "MCMCResult", "make_nuts_kernel", "make_hmc_kernel",
    "ParallelTempering", "PTResult", "geometric_ladder",
    "EllipticalSlice", "ESSResult",
    "DiscreteGibbs", "GibbsResult",
    "make_leapfrog", "IntegratorState", "NUTSInfo", "HMCInfo",
    "kinetic_energy", "sample_momentum", "velocity",
    "da_init", "da_update", "DualAveragingState",
    "welford_init", "welford_update", "welford_finalize", "WelfordState",
    "build_schedule", "find_reasonable_step_size",
]
