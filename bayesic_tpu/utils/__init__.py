"""Diagnostics, checkpointing, config, metrics (SURVEY.md C21/C23/aux)."""

from . import diagnostics

__all__ = ["diagnostics"]
