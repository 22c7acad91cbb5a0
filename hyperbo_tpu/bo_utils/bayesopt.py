"""Alias of hyperbo_tpu.bo.bayesopt (reference hyperbo/bo_utils/bayesopt.py)."""
from hyperbo_tpu.bo.bayesopt import (  # noqa: F401
    bayesopt, get_best_datapoint, retrain_model, run_bayesopt,
    simulated_bayesopt)
from hyperbo_tpu.bo.ondevice import (  # noqa: F401
    run_bayesopt_ondevice, simulated_bayesopt_ondevice,
    simulated_bayesopt_ondevice_hgp_resample,
    simulated_bayesopt_ondevice_qbatch,
    simulated_bayesopt_ondevice_retrain)
from hyperbo_tpu.core.defs import SubDataset  # noqa: F401
from hyperbo_tpu.bo.input_samplers import INPUT_SAMPLERS  # noqa: F401
