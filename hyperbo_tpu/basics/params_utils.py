"""Alias of hyperbo_tpu.core.params_io (reference hyperbo/basics/params_utils.py)."""
from hyperbo_tpu.core.params_io import (  # noqa: F401
    FINAL_PARAM_FILE_INFO, encode_model_filename, load_from_file,
    load_params, log_params_loss, save_params, save_to_file,
    to_list_or_float)
from hyperbo_tpu.core.warp import retrieve_params  # noqa: F401
from hyperbo_tpu.core.defs import GPParams  # noqa: F401
