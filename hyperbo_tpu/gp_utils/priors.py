"""Alias of hyperbo_tpu.models.priors (reference hyperbo/gp_utils/priors.py)."""
from hyperbo_tpu.models.priors import (  # noqa: F401
    DEFAULT_PRIORS, constant_prior, horseshoe_prior, kumar_prior,
    lognormal_prior, noise_prior)
