"""Log-prob priors for GP hyperparameters, in pure jnp.

Parity with reference hyperbo/gp_utils/priors.py:24-45, which uses
TFP-on-JAX distributions; here the log densities are written directly
(Normal, LogNormal, TruncatedNormal) — no TFP dependency, fully jittable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def _normal_log_prob(x, loc, scale):
  z = (x - loc) / scale
  return -0.5 * z * z - jnp.log(scale) - 0.5 * _LOG_2PI


def _lognormal_log_prob(x, loc, scale):
  logx = jnp.log(x)
  return _normal_log_prob(logx, loc, scale) - logx


def _truncated_normal_log_prob(x, loc, scale, low, high):
  z = _normal_log_prob(x, loc, scale)
  log_mass = jnp.log(
      jax.scipy.stats.norm.cdf((high - loc) / scale) -
      jax.scipy.stats.norm.cdf((low - loc) / scale))
  inside = jnp.logical_and(x >= low, x <= high)
  return jnp.where(inside, z - log_mass, -jnp.inf)


def _square_plus(x):
  return (x + jnp.sqrt(x**2 + 4)) / 2


def kumar_prior(params):
  """TruncatedNormal(0,1,[-2,2]) prior on log(squareplus(a/b))."""
  prior_ll = lambda x: _truncated_normal_log_prob(
      jnp.log(_square_plus(x)), 0., 1., -2., 2.)
  return jnp.sum(jnp.array([jnp.sum(prior_ll(v)) for v in params.values()]))


noise_prior = lambda x: jnp.sum(_normal_log_prob(x, 0., 0.1))
lognormal_prior = lambda x: jnp.sum(_lognormal_log_prob(x, 0., 1.))
constant_prior = lambda x: jnp.sum(_normal_log_prob(x, 0., 1.))
horseshoe_prior = lambda x, tau: jnp.log(jnp.log(1. + 3. * (tau / x)**2))

DEFAULT_PRIORS = {
    'noise_variance': noise_prior,
    'signal_variance': lognormal_prior,
    'constant': constant_prior,
}
