"""Distributions library (SURVEY.md C1) + transforms (C2)."""

from . import constraints
from .continuous import (
    Chi2,
    Gumbel,
    Pareto,
    Weibull,
    Beta,
    Cauchy,
    Exponential,
    Gamma,
    HalfCauchy,
    HalfNormal,
    InverseGamma,
    Laplace,
    LogNormal,
    Normal,
    StudentT,
    TruncatedNormal,
    Uniform,
)
from .discrete import (Bernoulli, Binomial, Categorical, Geometric,
                       Multinomial, NegativeBinomial, Poisson)
from .distribution import (
    Delta,
    Distribution,
    Independent,
    TransformedDistribution,
)
from .compound import (BetaBinomial, Censored, DirichletMultinomial,
                       Truncated,
                       GaussianRandomWalk, VonMises,
                       ZeroInflatedDistribution,
                       ZeroInflatedNegativeBinomial, ZeroInflatedPoisson)
from .hmm import HiddenMarkovModel
from .lgss import LinearGaussianStateSpace
from .mixture import MixtureSameFamily
from .multivariate import Dirichlet, LKJCholesky, MultivariateNormal
from .transforms import biject_to

__all__ = [
    "constraints",
    "biject_to",
    "Distribution",
    "Independent",
    "Delta",
    "TransformedDistribution",
    "Normal",
    "LogNormal",
    "HalfNormal",
    "Cauchy",
    "HalfCauchy",
    "StudentT",
    "Laplace",
    "Exponential",
    "Gamma",
    "InverseGamma",
    "Beta",
    "Uniform",
    "TruncatedNormal",
    "Bernoulli",
    "Binomial",
    "Categorical",
    "Poisson",
    "Geometric",
    "NegativeBinomial",
    "Multinomial",
    "Weibull",
    "Gumbel",
    "Pareto",
    "Chi2",
    "MultivariateNormal",
    "Dirichlet",
    "LKJCholesky",
    "BetaBinomial",
    "Censored",
    "Truncated",
    "DirichletMultinomial",
    "GaussianRandomWalk",
    "VonMises",
    "ZeroInflatedDistribution",
    "ZeroInflatedPoisson",
    "ZeroInflatedNegativeBinomial",
    "HiddenMarkovModel",
    "LinearGaussianStateSpace",
    "MixtureSameFamily",
]
