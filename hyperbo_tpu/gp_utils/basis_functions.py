"""Alias of hyperbo_tpu.models.basis (reference hyperbo/gp_utils/basis_functions.py)."""
from hyperbo_tpu.models.basis import (  # noqa: F401
    KumarWarp, MLP, init_kumar_warp_with_shape, init_mlp_with_shape)
