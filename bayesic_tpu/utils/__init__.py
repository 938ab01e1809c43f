"""Diagnostics, checkpointing, config, metrics (SURVEY.md C21/C23/aux)."""

from . import compare, diagnostics

__all__ = ["compare", "diagnostics"]
