"""Tempered SMC backend (SURVEY.md C9, C13b)."""

from .smc import SMC, SMCResult

__all__ = ["SMC", "SMCResult"]
