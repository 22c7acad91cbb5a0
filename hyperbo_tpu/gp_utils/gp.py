"""Alias of hyperbo_tpu.models.gp (reference hyperbo/gp_utils/gp.py)."""
from hyperbo_tpu.models.gp import (  # noqa: F401
    GP, GPCache, GPParams, HGP, SubDataset, infer_parameters, predict,
    sample_from_gp)
