"""Alias of hyperbo_tpu.models.divergences (reference hyperbo/gp_utils/utils.py)."""
from hyperbo_tpu.core.defs import SubDataset  # noqa: F401
from hyperbo_tpu.models.divergences import (  # noqa: F401
    DEFAULT_SOFTPLUS, DEFAULT_WARP_FUNC, EPS, euclidean_multivariate_normal,
    identity_warp, kl_multivariate_normal, partial_kl_mvn, softplus_warp,
    squareplus_warp, sub_sample_dataset_iterator)
