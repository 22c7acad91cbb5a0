"""Alias of hyperbo_tpu.train.optimizers (reference hyperbo/basics/lbfgs.py)."""
from hyperbo_tpu.train.optimizers import (  # noqa: F401
    backtracking_linesearch, lbfgs, lbfgs_descent_dir_nocedal)
