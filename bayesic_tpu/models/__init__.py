"""The five reference example models (SURVEY.md C16-C20, BASELINE
configs) plus the round-2/3 additions (GP regression, structural time
series, sparse variational GP)."""

from . import (dlgm, gmm, gp, hier_logistic, linreg, matrix_fact,  # noqa: F401
               sts, svgp)
