"""Alias of hyperbo_tpu.train.optimizers (reference hyperbo/basics/lbfgs.py)."""
from hyperbo_tpu.train.optimizers import lbfgs  # noqa: F401
