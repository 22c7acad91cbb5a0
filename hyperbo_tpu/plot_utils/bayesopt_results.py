"""Alias of hyperbo_tpu.analysis.bayesopt_results."""
from hyperbo_tpu.analysis.plots import plot_all  # noqa: F401
from hyperbo_tpu.analysis.bayesopt_results import (  # noqa: F401
    add_regret_array,
    WORKLOAD2NAME, analyze_results, compute_workload2ref, decode_exp_key,
    get_exp_result, get_hpob_exp, get_method2fraction, get_model,
    get_multi_hpob_exp, get_results, get_workload2result, hpob_results,
    process_results, run_in_parallel)
