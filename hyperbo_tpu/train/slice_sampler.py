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
import os
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


# ---------------------------------------------------------------------------
# On-device sampler: the whole chain (stepping out, shrinkage, coordinate
# sweep, iteration loop) is traced into ONE jitted program, so an HGP
# pre-training run costs O(1) device dispatches instead of one host round
# trip per probe (the host loop above pays the ~28 ms tunnel RTT on every
# stepping-out/shrinkage evaluation). Multiple chains run under vmap and
# split the 2*nsamples budget, batching every log-prob evaluation (each a
# multi-task GP NLL -> batched Gram + Cholesky on the MXU).
# ---------------------------------------------------------------------------


def _coord_update(log_prob, x, i, ll, key, width, max_steps_out, max_shrink):
  """One traced univariate slice-sampling update of coordinate x[i].

  Same semantics as _slice_sample_coord: stepping out bounded by
  max_steps_out per side, shrinkage bounded by max_shrink with rejection
  of non-finite proposals; on shrinkage exhaustion the coordinate (and
  its log prob) is left unchanged.
  """
  k1, k2, k3, k4 = jax.random.split(key, 4)
  log_y = ll + jnp.log(jax.random.uniform(k1))
  x0i = x[i]
  u = jax.random.uniform(k2)
  left0 = x0i - u * width
  right0 = left0 + width

  def logp_at(v):
    return log_prob(x.at[i].set(v))

  # Both stepping-out sides advance in ONE while_loop with a batched
  # 2-edge log-prob eval: identical decisions and identical per-side
  # trip bounds as two sequential loops (stepping out is deterministic
  # given log_y), but the SERIAL eval depth drops from L + R to
  # max(L, R) — and under the chains vmap, to the max over lanes AND
  # sides instead of the sum of per-side lane maxima. Each log-prob
  # here is a full corpus NLL, so serial depth is the cost driver
  # (PERF.md round-5 HGP-resample dissection).
  # HYPERBO_SLICE_STEPOUT=serial (trace-time) restores the two
  # sequential per-side loops — the A/B hook for that dissection.
  if os.environ.get('HYPERBO_SLICE_STEPOUT', 'fused') == 'serial':
    def one_side(side_sign, edge0):
      def cond(state):
        edge, j = state
        return (j < max_steps_out) & (logp_at(edge) > log_y)
      def body(state):
        edge, j = state
        return edge + side_sign * width, j + 1
      edge, _ = jax.lax.while_loop(cond, body, (edge0, 0))
      return edge
    left = one_side(-1.0, left0)
    right = one_side(1.0, right0)
  else:
    sides = jnp.array([-1.0, 1.0], jnp.float32)

    def out_cond(state):
      edges, grow, j = state
      return jnp.any(grow & (j < max_steps_out))

    def out_body(state):
      edges, grow, j = state
      lls = jax.vmap(logp_at)(edges)
      step = grow & (j < max_steps_out) & (lls > log_y)
      return edges + jnp.where(step, sides * width, 0.0), step, j + step

    (edges, _, _) = jax.lax.while_loop(
        out_cond, out_body,
        (jnp.stack([left0, right0]), jnp.array([True, True]),
         jnp.zeros((2,), jnp.int32)))
    left, right = edges[0], edges[1]

  def shrink_cond(state):
    _, _, _, _, _, done, j = state
    return (~done) & (j < max_shrink)

  def shrink_body(state):
    k, left, right, xi, lli, done, j = state
    k, kd = jax.random.split(k)
    x1 = left + jax.random.uniform(kd) * (right - left)
    ll_new = logp_at(x1)
    accept = jnp.isfinite(ll_new) & (ll_new > log_y)
    xi = jnp.where(accept, x1, xi)
    lli = jnp.where(accept, ll_new, lli)
    shrink_left = (~accept) & (x1 < x0i)
    left = jnp.where(shrink_left, x1, left)
    right = jnp.where((~accept) & ~shrink_left, x1, right)
    return k, left, right, xi, lli, accept, j + 1

  _, _, _, xi, lli, _, _ = jax.lax.while_loop(
      shrink_cond, shrink_body, (k3, left, right, x0i, ll, False, 0))
  del k4  # key-split parity with the host version
  return x.at[i].set(xi), lli


def _run_chain(log_prob, x, key, total, width, max_steps_out, max_shrink):
  """Traced chain: `total` full coordinate sweeps; returns (total, dim) xs."""
  dim = x.shape[0]
  ll = log_prob(x)

  def sweep(carry, _):
    x, ll, key = carry
    key, perm_key = jax.random.split(key)
    order = jax.random.permutation(perm_key, dim)

    def coord(p, state):
      x, ll, k = state
      k, ck = jax.random.split(k)
      x, ll = _coord_update(log_prob, x, order[p], ll, ck, width,
                            max_steps_out, max_shrink)
      return x, ll, k

    x, ll, key = jax.lax.fori_loop(0, dim, coord, (x, ll, key))
    return (x, ll, key), (x, ll)

  (_, _, _), (xs, lls) = jax.lax.scan(
      sweep, (x, ll, key), None, length=total)
  return xs, lls


def slice_sample_ondevice(
    objective_fn: Callable[[Dict[str, Any]], jnp.ndarray],
    model_params: Dict[str, Any],
    key: jax.Array,
    burnin: int,
    nsamples: int,
    width: float = 1.0,
    max_steps_out: int = 10,
    max_shrink: int = 100,
    num_chains: int = 1,
    init_jitter: float = 0.0) -> List[Dict[str, Any]]:
  """TPU-native slice sampler: one compiled program for the whole run.

  Semantics match `slice_sample` (Neal-2003 stepping-out + shrinkage,
  coordinate-wise in a fresh random order per sweep); the 2*nsamples
  output budget is split evenly across `num_chains` vmapped chains, each
  burning in independently (chain c > 0 starts from the given params plus
  N(0, init_jitter^2) noise). The HGP output contract (a list of
  2*nsamples model-parameter pytrees) is preserved.

  Args:
    objective_fn: model_params -> scalar objective; -objective_fn is the
      unnormalized log posterior. Must be jittable.
    model_params: starting parameters (unconstrained space).
    key: PRNG key.
    burnin: discarded leading sweeps (per chain).
    nsamples: 2*nsamples total samples are returned.
    width: initial slice width.
    max_steps_out: stepping-out bound per side (host parity: 10).
    max_shrink: shrinkage bound (host parity: 100).
    num_chains: vmapped parallel chains; must divide 2*nsamples.
    init_jitter: stddev of the per-chain init perturbation.

  Returns:
    List of sampled model parameter pytrees (length 2*nsamples).
  """
  x0, unravel = flatten_util.ravel_pytree(model_params)
  x0 = jnp.asarray(x0, jnp.float32)

  def log_prob(v):
    return -objective_fn(unravel(v))

  ll0 = float(jax.jit(log_prob)(x0))
  if not np.isfinite(ll0):
    raise ValueError(f'Slice sampler started at non-finite log prob {ll0}.')

  want = 2 * nsamples
  if num_chains < 1 or want % num_chains:
    raise ValueError(
        f'num_chains={num_chains} must divide 2*nsamples={want}.')
  per_chain = want // num_chains
  total = burnin + per_chain

  @jax.jit
  def run_all(x0, key):
    ckeys = jax.random.split(key, num_chains + 1)
    jit_keys = jax.random.split(ckeys[0], num_chains)
    inits = jax.vmap(
        lambda k, c: x0 + jnp.where(
            c > 0, init_jitter, 0.0) * jax.random.normal(k, x0.shape))(
                jit_keys, jnp.arange(num_chains))
    xs, lls = jax.vmap(
        lambda x, k: _run_chain(log_prob, x, k, total, width,
                                max_steps_out, max_shrink))(
                                    inits, ckeys[1:])
    return xs[:, burnin:], lls[:, burnin:]

  xs, lls = run_all(x0, key)
  xs = np.asarray(jax.device_get(xs))  # (C, per_chain, dim)
  logging.info('slice_sample_ondevice: %d chains x %d kept, final '
               'log_prob per chain = %s', num_chains, per_chain,
               np.asarray(lls[:, -1]))
  # Interleave chains so truncating a prefix stays chain-balanced.
  flat = xs.transpose(1, 0, 2).reshape(want, x0.shape[0])
  return [unravel(jnp.asarray(row)) for row in flat]
