"""Alias of hyperbo_tpu.models.objectives (reference hyperbo/gp_utils/objectives.py)."""
from hyperbo_tpu.models.objectives import (  # noqa: F401
    add, ekl, euc, kl, mul, multivariate_normal_divergence,
    multivariate_normal_euc_distance, neg_log_marginal_likelihood, nll,
    nll_regeuc, nll_regeuc1, nll_regeuc01, nll_regeuc10, nll_regkl,
    nll_regkl1, nll_regkl01, nll_regkl10, regeuc, regkl)
from hyperbo_tpu.models.packed import (  # noqa: F401
    multivariate_normal_divergence_packed,
    neg_log_marginal_likelihood_packed, pack_aligned_dataset,
    pack_dataset)
