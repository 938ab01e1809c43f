"""The five reference example models (SURVEY.md C16-C20, BASELINE configs)."""

from . import dlgm, gmm, hier_logistic, linreg, matrix_fact  # noqa: F401
