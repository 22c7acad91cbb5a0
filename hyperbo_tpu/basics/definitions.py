"""Alias of hyperbo_tpu.core.defs (reference hyperbo/basics/definitions.py)."""
from hyperbo_tpu.core.defs import (  # noqa: F401
    AllowedDatasetTypes, GPCache, GPParams, SubDataset, WarpFuncType)
