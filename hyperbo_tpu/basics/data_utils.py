"""Alias of hyperbo_tpu.data.utils (reference hyperbo/basics/data_utils.py)."""
from hyperbo_tpu.data.utils import log_dataset, sub_sample_dataset_iterator  # noqa: F401
from hyperbo_tpu.core.defs import SubDataset  # noqa: F401
