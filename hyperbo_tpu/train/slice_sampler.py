"""Slice sampling over GP hyperparameters (the HGP posterior sampler).

The reference accepts method='slice_sample' (hyperbo/gp_utils/gp.py:111,
forced for HGP at bo_utils/bayesopt.py:252) and HGP consumes
`GPParams.samples` (gp.py:626-631), but the sampler implementation was
stripped from the OSS release (SURVEY.md section 2, missing-in-OSS). This
module reconstructs it from the consumer contract:

  * log posterior = -(objective) — the NLL objective already subtracts
    hyperprior log-probs when config['priors'] is set, so its negation is
    the unnormalized log posterior over unconstrained parameters.
  * univariate slice sampling (Neal 2003) with stepping-out + shrinkage,
    applied coordinate-wise over the raveled parameter vector.
  * `burnin` iterations are discarded, then 2*`nsamples` kept — matching
    the OSS test contract that HGP.predict returns nsamples*2 predictions
    (reference gp_utils/slice_sampling_test.py:150).

The per-coordinate log-prob evaluations share one jitted closure; all
evaluations are O(small-n) GP NLLs, so the host loop is not a bottleneck.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional

import jax
from jax import flatten_util
import jax.numpy as jnp
import numpy as np


def _slice_sample_coord(log_prob, x, i, ll, key, width=1.0, max_steps_out=10):
  """One univariate slice-sampling update of coordinate i (host-side)."""
  k1, k2, k3, k4 = jax.random.split(key, 4)
  log_y = ll + float(jnp.log(jax.random.uniform(k1)))
  x0 = float(x[i])
  u = float(jax.random.uniform(k2))
  left = x0 - u * width
  right = left + width

  # Stepping out.
  j = 0
  while j < max_steps_out and float(log_prob(x.at[i].set(left))) > log_y:
    left -= width
    j += 1
  j = 0
  while j < max_steps_out and float(log_prob(x.at[i].set(right))) > log_y:
    right += width
    j += 1

  # Shrinkage.
  for _ in range(100):
    k3, kd = jax.random.split(k3)
    x1 = left + float(jax.random.uniform(kd)) * (right - left)
    cand = x.at[i].set(x1)
    ll_new = float(log_prob(cand))
    if np.isfinite(ll_new) and ll_new > log_y:
      return cand, ll_new, k4
    if x1 < x0:
      left = x1
    else:
      right = x1
  logging.warning('Slice sampler shrinkage exhausted at coord %d.', i)
  return x, ll, k4


def slice_sample(objective_fn: Callable[[Dict[str, Any]], jnp.ndarray],
                 model_params: Dict[str, Any],
                 key: jax.Array,
                 burnin: int,
                 nsamples: int,
                 width: float = 1.0,
                 callback: Optional[Callable[..., Any]] = None,
                 logging_interval: int = 10) -> List[Dict[str, Any]]:
  """Draw posterior samples of the model parameters.

  Args:
    objective_fn: model_params -> scalar objective (NLL incl. priors);
      -objective_fn is the unnormalized log posterior.
    model_params: starting parameters (unconstrained space).
    key: PRNG key.
    burnin: discarded leading iterations.
    nsamples: 2*nsamples samples are returned (HGP contract, see module
      docstring).
    width: initial slice width.
    callback: optional (step, model_params, loss) hook.
    logging_interval: log every this many iterations.

  Returns:
    List of sampled model parameter pytrees (length 2*nsamples).
  """
  x0, unravel = flatten_util.ravel_pytree(model_params)
  log_prob = jax.jit(lambda v: -objective_fn(unravel(v)))

  x = x0
  ll = float(log_prob(x))
  if not np.isfinite(ll):
    raise ValueError(f'Slice sampler started at non-finite log prob {ll}.')
  dim = x.shape[0]
  keep = []
  total = burnin + 2 * nsamples
  for it in range(total):
    key, perm_key = jax.random.split(key)
    order = jax.random.permutation(perm_key, dim)
    for i in np.asarray(order):
      key, ck = jax.random.split(key)
      x, ll, _ = _slice_sample_coord(log_prob, x, int(i), ll, ck, width)
    if it % logging_interval == 0:
      logging.info('slice_sample iter %d/%d log_prob=%f', it, total, ll)
    if callback is not None:
      callback(step=it, model_params=unravel(x), loss=-ll)
    if it >= burnin:
      keep.append(unravel(x))
  return keep
