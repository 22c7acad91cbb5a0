"""Alias of hyperbo_tpu.train.optimizers (reference hyperbo/basics/bfgs.py)."""
from hyperbo_tpu.train.optimizers import bfgs  # noqa: F401
