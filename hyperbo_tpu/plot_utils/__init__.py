"""Reference-compatible alias package: hyperbo.plot_utils -> hyperbo_tpu."""
from hyperbo_tpu.plot_utils import bayesopt_results, utils  # noqa: F401
