"""Acquisition functions for Bayesian optimization.

API parity with reference hyperbo/bo_utils/acfun.py:28-187: the same
wrapper pattern (scalar sub-function over posterior (mu, sigma) + a
callback providing the acquisition parameter), the same exported names
(ei / pi / pi2 / pi3 / ucb / ucb2 / ucb3 / ucb4 / rand) and HGP
averaging, plus 'ts' (Thompson sampling — absent from the reference,
matching the on-device loops' method table).

All sub-functions are pure elementwise maps over (mu, std) — scoring n
candidates is one fused VPU pass after the batched posterior, and the
whole acquisition is vmappable over models (the reference's own test
precedent, acfun_test.py:100-118). For the fully-on-device BO iteration
see hyperbo_tpu.bo.ondevice.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Union

import jax.numpy as jnp
import jax.random as jrd
import jax.scipy as jsp

from hyperbo_tpu.models import gp

partial = functools.partial


def random_search(model, x_queries, **unused_kwargs):
  """Uniform random scores (random-search baseline). Consumes model.rng."""
  assert model.rng is not None, 'Random search requires random key.'
  key, subkey = jrd.split(model.rng)
  model.rng = key
  return jrd.uniform(subkey, (x_queries.shape[0], 1))


def thompson_sampling(*, model, sub_dataset_key, x_queries,
                      **unused_kwargs):
  """Thompson-sampling scores: ONE posterior draw of the latent f.

  The BO loop's argmax of these scores IS Thompson sampling. Mirrors
  bo.ondevice's 'ts' semantics — GP: a latent-function draw (no
  observation noise, no unbiased rescale: with noise left in, a
  well-observed candidate's draw std floors at ~sqrt(noise) instead of
  collapsing); HGP: draw hyperparameters (one posterior sample,
  uniformly) and then the function from that sample's posterior.
  Consumes model.rng like random_search. The draw is decoupled per
  candidate (diagonal covariance), so it is not a coherent function to
  gradient-ascend — the continuous loop skips L-BFGS-B refinement for
  'ts' (see bayesopt). Absent from the reference (added alongside the
  on-device loops' 'ts').
  """
  assert model.rng is not None, 'Thompson sampling requires random key.'
  key, subkey = jrd.split(model.rng)
  model.rng = key
  if isinstance(model, gp.HGP):
    s_key, d_key = jrd.split(subkey)
    mu_s, var_s = model.predict_stacked(
        x_queries, sub_dataset_key=sub_dataset_key, with_noise=False)
    # predict_stacked applies the N/(N-1) unbiased rescale; invert it
    # to draw the latent function (matching ondevice._ts_index).
    n_unaligned = len(
        [k for k, v in model.dataset.items() if v.aligned is None])
    scale = (n_unaligned / (n_unaligned - 1.)
             if n_unaligned > 1 else 1.0)
    s = jrd.randint(s_key, (), 0, mu_s.shape[0])
    mu, var_f = mu_s[s], jnp.maximum(var_s[s] / scale, 1e-12)
    return mu + jnp.sqrt(var_f) * jrd.normal(d_key, mu.shape)
  mu, var_f = model.predict(
      x_queries, sub_dataset_key=sub_dataset_key, full_cov=False,
      with_noise=False, unbiased=False)
  return mu + jnp.sqrt(jnp.maximum(var_f, 1e-12)) * jrd.normal(
      subkey, mu.shape)


def expected_improvement_sub(mu, std, target):
  """Closed-form EI: (phi(g) - g * (1 - Phi(g))) * std, g = (t - mu)/std."""
  gamma = (target - mu) / std
  return (jsp.stats.norm.pdf(gamma) - gamma *
          (1 - jsp.stats.norm.cdf(gamma))) * std


def probability_of_improvement_sub(mu, std, target):
  """PI expressed as the negative z-score of the target (rank-equivalent)."""
  gamma = (target - mu) / std
  return -gamma


def ucb_sub(mu, std, beta=3.):
  """Upper confidence bound mu + beta * std."""
  return mu + beta * std


def acfun_wrapper(
    acfun_sub: Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray],
    acfun_callback_default: Callable[..., Any],
):
  """Build an acquisition function from a sub-function + parameter callback.

  The returned function scores x_queries (n' x d) against the posterior of
  model at sub_dataset_key, returning n' x 1 values. HGP models average
  the acquisition over their posterior samples.
  """

  def acquisition_function(*,
                           model: gp.GP,
                           sub_dataset_key: Union[int, str],
                           x_queries: jnp.ndarray,
                           acfun_callback: Callable[
                               ..., Any] = acfun_callback_default):
    if isinstance(model, gp.HGP):
      # Batched posterior over all S samples: ONE vmapped factorization
      # per BO iteration instead of S sequential Choleskys (the per-
      # sample loop invalidated every cache via update_model_params).
      mu_s, var_s = model.predict_stacked(
          x_queries, sub_dataset_key=sub_dataset_key, with_noise=True)
      acfun_param = acfun_callback(model, sub_dataset_key)
      ac_vals = acfun_sub(mu_s, jnp.sqrt(var_s), acfun_param)
      return jnp.mean(ac_vals, axis=0)
    mu, var = model.predict(
        x_queries, sub_dataset_key=sub_dataset_key,
        full_cov=False, with_noise=True)
    acfun_param = acfun_callback(model, sub_dataset_key)
    return acfun_sub(mu, jnp.sqrt(var), acfun_param)

  return acquisition_function


def ei_callback_default(model, key, **unused_kwargs):
  """EI target: best observed y (0 with no observations)."""
  if key not in model.dataset or model.dataset[key].y.shape[0] == 0:
    return 0.0
  return jnp.max(model.dataset[key].y)


def pi_callback_default(model, key, zeta=0.1, use_std=False, **unused_kwargs):
  """PI target: best observed y + zeta (optionally + zeta * std(y))."""
  if key not in model.dataset or model.dataset[key].y.shape[0] == 0:
    return 0.0
  if use_std:
    return jnp.max(model.dataset[key].y) + zeta * jnp.std(
        model.dataset[key].y)
  return jnp.max(model.dataset[key].y) + zeta


expected_improvement = acfun_wrapper(
    acfun_sub=expected_improvement_sub,
    acfun_callback_default=ei_callback_default)
ei = expected_improvement

probability_of_improvement = acfun_wrapper(
    acfun_sub=probability_of_improvement_sub,
    acfun_callback_default=pi_callback_default)
pi = probability_of_improvement
pi2 = acfun_wrapper(
    acfun_sub=probability_of_improvement_sub,
    acfun_callback_default=partial(pi_callback_default, use_std=True))
pi3 = acfun_wrapper(
    acfun_sub=probability_of_improvement_sub,
    acfun_callback_default=partial(pi_callback_default, zeta=0.05))

# UCB variants; default coefficient 3.
ucb4 = acfun_wrapper(acfun_sub=ucb_sub, acfun_callback_default=lambda a, b: 4.)
ucb3 = acfun_wrapper(acfun_sub=ucb_sub, acfun_callback_default=lambda a, b: 3.)
ucb2 = acfun_wrapper(acfun_sub=ucb_sub, acfun_callback_default=lambda a, b: 2.)
ucb = ucb3

rand = random_search
ts = thompson_sampling
