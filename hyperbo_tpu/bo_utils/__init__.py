"""Reference-compatible alias package: hyperbo.bo_utils -> hyperbo_tpu."""
from hyperbo_tpu.bo_utils import acfun, bayesopt, const, data  # noqa: F401
