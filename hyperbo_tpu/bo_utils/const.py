"""Alias of hyperbo_tpu.bo.const (reference hyperbo/bo_utils/const.py)."""
from hyperbo_tpu.bo.const import (  # noqa: F401
    ACFUN, ACFUN_SUB, CONTEXTUAL_METHODS, EPS, HBO, HBO_METHODS, HBO_NLL,
    HBO_NLLEUC, HBO_NLLKL, HBO_SS, HYPERBO_DATASETS, INPUT_SAMPLERS,
    KERNEL, MEAN, MTBO, OFFLINE_METHODS, ONLINE_METHODS, RAND, STBO,
    STBOV, ST_METHODS, USE_HGP)
