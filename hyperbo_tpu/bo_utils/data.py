"""Alias of hyperbo_tpu.data (reference hyperbo/bo_utils/data.py)."""
from hyperbo_tpu.core.defs import SubDataset  # noqa: F401
from hyperbo_tpu.data.frames import (  # noqa: F401
    get_aligned_dataset, get_dataset, perturb_dataset_with_flat_functions,
    process_dataframe, sample_dataframe, sample_sub_dataset)
from hyperbo_tpu.data.pd1 import (  # noqa: F401
    LESS_POINTS_WORKLOAD, PD1, _deduplicate, _normalize_maf_dataset,
    get_output_warper, grid2020, normalize, pd1, pd2,
    process_pd1_for_maf)
from hyperbo_tpu.data.synthetic import random  # noqa: F401
from hyperbo_tpu.data.hpob import SEARCH_SPACE2TEST_DATASETS, HPOB_ROOT_DIR, hpob  # noqa: F401,E402
