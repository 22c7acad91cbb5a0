"""Reference-compatible alias package: hyperbo.gp_utils -> hyperbo_tpu."""
from hyperbo_tpu.gp_utils import basis_functions, gp, kernel, mean, objectives, priors, utils  # noqa: F401
