"""SVI backend (SURVEY.md C5-C7)."""

from .elbo import draw_subsample, make_elbo
from .flows import FlowGuide
from .guides import (FullRankGuide, Guide, LowRankGuide, MeanFieldGuide,
                     NeuralGuide, TraceGuide, unraveler)
from .svi import SVI, SVIResult, SVIState

__all__ = [
    "SVI", "SVIResult", "SVIState", "make_elbo", "draw_subsample",
    "Guide", "MeanFieldGuide", "FullRankGuide", "LowRankGuide", "FlowGuide",
    "NeuralGuide",
    "TraceGuide", "unraveler",
]
