"""Alias of hyperbo_tpu.ops.linalg (reference hyperbo/basics/linalg.py)."""
from hyperbo_tpu.ops.linalg import (  # noqa: F401
    EPS, cholesky_cache, compute_delta_y_and_cov,
    inverse_spdmatrix_vector_product, safe_l2norm, safe_sqrt,
    solve_gp_linear_system, solve_linear_system, svd_matrix_sqrt)
