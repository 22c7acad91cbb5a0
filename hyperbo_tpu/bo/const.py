"""Name -> object registries and method-name constants.

Parity with reference hyperbo/bo_utils/const.py:22-81. Notable upgrade:
INPUT_SAMPLERS is populated (the reference ships it empty, const.py:61,
which makes the continuous-oracle path unreachable) — see
hyperbo_tpu.bo.input_samplers.
"""

from hyperbo_tpu.bo import acfun
from hyperbo_tpu.bo.input_samplers import INPUT_SAMPLERS  # noqa: F401
from hyperbo_tpu.data import hpob as hpob_data
from hyperbo_tpu.data import pd1 as pd1_data
from hyperbo_tpu.data import synthetic
from hyperbo_tpu.models import kernel
from hyperbo_tpu.models import mean

MEAN = {
    'constant': mean.constant,
    'linear': mean.linear,
    'linear_mlp': mean.linear_mlp,
    'zero': mean.zero,
}

KERNEL = {
    'squared_exponential': kernel.squared_exponential,
    'matern32': kernel.matern32,
    'matern52': kernel.matern52,
    'dot_product': kernel.dot_product,
    'dot_product_mlp': kernel.dot_product_mlp,
    'squared_exponential_mlp': kernel.squared_exponential_mlp,
    'matern32_mlp': kernel.matern32_mlp,
    'matern52_mlp': kernel.matern52_mlp,
}

ACFUN = {
    'expected_improvement': acfun.expected_improvement,
    'probability_of_improvement': acfun.probability_of_improvement,
    'ucb3': acfun.ucb3,
    'random_search': acfun.random_search,
    'ucb2': acfun.ucb2,
    'ucb': acfun.ucb,
    'thompson_sampling': acfun.thompson_sampling,
}

ACFUN_SUB = {
    'expected_improvement': acfun.expected_improvement_sub,
    'probability_of_improvement': acfun.probability_of_improvement_sub,
    'ucb': acfun.ucb_sub,
}

EPS = 1e-6

HYPERBO_DATASETS = {
    'pd1': pd1_data.pd1,
    'hpob': hpob_data.hpob,
    'pd2': pd1_data.pd2,
    'grid2020': pd1_data.grid2020,
    'random': synthetic.random,
}

# Offline experiment method names.
RAND = 'rand'
STBO = 'stbo'
MTBO = 'mtbo'
STBOV = 'gp'
HBO = 'hyperbo'
HBO_SS = 'hyperbo_ss'
HBO_NLL = 'hyperbo_nll'
HBO_NLLKL = 'hyperbo_nllkl'
HBO_NLLEUC = 'hyperbo_nlleuc'

CONTEXTUAL_METHODS = ['rfgp', 'mimo', STBOV]

HBO_METHODS = [HBO_SS, HBO_NLL, HBO_NLLKL, HBO_NLLEUC]
OFFLINE_METHODS = [RAND, STBO, MTBO, HBO, HBO_SS] + CONTEXTUAL_METHODS

ONLINE_METHODS = [STBO, MTBO] + HBO_METHODS
USE_HGP = [HBO_SS]
ST_METHODS = [STBO, STBOV]
