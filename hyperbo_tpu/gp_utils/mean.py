"""Alias of hyperbo_tpu.models.mean (reference hyperbo/gp_utils/mean.py)."""
from hyperbo_tpu.models.mean import constant, linear, linear_mlp, zero  # noqa: F401
