"""Alias of hyperbo_tpu.models.kernel (reference hyperbo/gp_utils/kernel.py)."""
from hyperbo_tpu.models.kernel import (  # noqa: F401
    covariance_matrix, dot_product, dot_product_kumar, dot_product_mlp, matern32,
    matern32_kumar, matern32_mlp, matern52, matern52_kumar, matern52_mlp,
    squared_exponential, squared_exponential_kumar,
    squared_exponential_mlp, with_kumar_bases, with_mlp_bases)
