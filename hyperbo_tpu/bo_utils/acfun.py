"""Alias of hyperbo_tpu.bo.acfun (reference hyperbo/bo_utils/acfun.py)."""
from hyperbo_tpu.bo.acfun import (  # noqa: F401
    acfun_wrapper, ei, ei_callback_default, expected_improvement,
    expected_improvement_sub, pi, pi2, pi3, pi_callback_default,
    probability_of_improvement, probability_of_improvement_sub, rand,
    random_search, thompson_sampling, ts, ucb, ucb2, ucb3, ucb4,
    ucb_sub)
