"""Alias of hyperbo_tpu.models.mean (reference hyperbo/gp_utils/mean.py)."""
from hyperbo_tpu.models.mean import (  # noqa: F401
    constant, linear, linear_mlp, mean_vector, zero)
