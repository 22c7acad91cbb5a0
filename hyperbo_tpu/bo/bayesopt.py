"""Bayesian-optimization loops for sequential queries.

Covers the reference surface (hyperbo/bo_utils/bayesopt.py:36-345):
`bayesopt` (continuous-oracle), `simulated_bayesopt` (offline over a
finite candidate set), `run_bayesopt` (experiment entry), plus the
contextual/MTBO helpers — but structured around ONE sequential driver
(`_bo_iterations`) parameterized by a proposal function, instead of two
parallel loop bodies. The L-BFGS-B refinement uses scipy with a jitted
JAX value-and-grad oracle (the reference used jaxopt's scipy wrapper).

For the fully on-device scan-based loop with rank-1 posterior updates
(the TPU production path), see hyperbo_tpu.bo.ondevice.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from hyperbo_tpu.core import defs
from hyperbo_tpu.models import gp
from hyperbo_tpu.models import objectives as obj
from hyperbo_tpu.models import priors

SubDataset = defs.SubDataset

# Config forced onto HGP methods (posterior sampling via the slice
# sampler; reference behavior at hyperbo/bo_utils/bayesopt.py:247-255).
_HGP_SAMPLING_CONFIG = {
    'objective': 'nll',
    'method': 'slice_sample',
    'burnin': 50,
    'nsamples': 50,
}


def get_best_datapoint(sub_dataset):
  """Return the (x, y) pair with maximal y, or None if empty."""
  if sub_dataset.y.shape[0] == 0:
    return None
  best_idx = jnp.argmax(sub_dataset.y)
  return (sub_dataset.x[best_idx], sub_dataset.y[best_idx])


def retrain_model(model: gp.GP,
                  sub_dataset_key: Union[int, str],
                  random_key: Optional[jax.Array] = None,
                  get_params_path: Optional[Callable[..., Any]] = None,
                  callback: Optional[Callable[..., Any]] = None):
  """Retrain on the growing test sub-dataset if config['retrain'] > 0.

  Unlike the reference (hyperbo/bo_utils/bayesopt.py:70), the temporary
  `max_training_step` override is restored afterwards — the reference
  permanently clobbers the model's training config after one retraining
  BO run.
  """
  config = model.params.config
  if not (config.get('retrain', 0) > 0 and
          model.dataset[sub_dataset_key].x.shape[0] > 0):
    return
  if config['objective'] in [obj.regkl, obj.regeuc]:
    raise ValueError('Objective must include NLL to retrain.')
  logging.info('Retraining with max_training_step = %d.',
               config['retrain'])
  saved = config.get('max_training_step')
  config['max_training_step'] = config['retrain']
  try:
    model.train(random_key, get_params_path=get_params_path,
                callback=callback)
  finally:
    if saved is None:
      config.pop('max_training_step', None)
    else:
      config['max_training_step'] = saved


def _is_random_search(ac_func) -> bool:
  return getattr(ac_func, '__name__', '') in ('rand', 'random_search')


def _skips_refinement(ac_func) -> bool:
  """Acquisitions whose scores are not a smooth surrogate to ascend:
  random search (a refined random baseline is no longer random) and
  Thompson sampling (a decoupled per-point draw is not a coherent
  function; matches bo.ondevice's continuous-loop 'ts')."""
  return (_is_random_search(ac_func) or
          getattr(ac_func, '__name__', '') in ('ts', 'thompson_sampling'))


def _bo_iterations(model: gp.GP,
                   sub_dataset_key: Union[int, str],
                   iters: int,
                   propose: Callable[[Optional[jax.Array], int],
                                     Tuple[jnp.ndarray, jnp.ndarray]],
                   key: Optional[jax.Array],
                   get_params_path: Optional[Callable[..., Any]] = None,
                   callback: Optional[Callable[..., Any]] = None
                   ) -> SubDataset:
  """Shared sequential BO driver: retrain -> propose -> append.

  `propose(subkey, i)` returns the next (x, y) observation; it sees a
  fresh PRNG subkey per iteration (None when no key was given).
  """
  for i in range(iters):
    retrain_key = None
    if key is not None:
      key, retrain_key = jax.random.split(key)
    retrain_model(model, sub_dataset_key=sub_dataset_key,
                  random_key=retrain_key,
                  get_params_path=get_params_path, callback=callback)
    propose_key = None
    if key is not None:
      key, propose_key = jax.random.split(key)
    datapoint = propose(propose_key, i)
    model.update_sub_dataset(
        datapoint, sub_dataset_key=sub_dataset_key, is_append=True)
  return model.dataset.get(sub_dataset_key,
                           SubDataset(jnp.empty(0), jnp.empty(0)))


def _argmax_or_random(model, sub_dataset_key, ac_func, x_queries, subkey):
  """Candidate index: acquisition argmax, or uniform for random search."""
  if _is_random_search(ac_func):
    logging.info('Using random search for bayesopt.')
    if subkey is None:
      raise ValueError('Must specify a random key for random search.')
    return jax.random.choice(subkey, x_queries.shape[0])
  evals = ac_func(model=model, sub_dataset_key=sub_dataset_key,
                  x_queries=x_queries)
  return evals.argmax()


def _lbfgsb_refine(fun, x_init, input_dim):
  """Bounded L-BFGS-B refinement of an acquisition argmax in [0,1]^d.

  scipy driver with a jitted JAX value-and-grad oracle.
  """
  vg = jax.jit(jax.value_and_grad(fun))

  def f_np(x):
    v, g = vg(jnp.asarray(x, jnp.float32))
    return float(v), np.asarray(g, np.float64)

  res = scipy.optimize.minimize(
      f_np, np.asarray(x_init, np.float64), jac=True, method='L-BFGS-B',
      bounds=[(0., 1.)] * input_dim)
  return jnp.asarray(res.x, jnp.float32)


def bayesopt(
    key: Any,
    model: gp.GP,
    sub_dataset_key: Union[int, str],
    query_oracle: Callable[[Any], Any],
    ac_func: Callable[..., jnp.ndarray],
    iters: int,
    input_sampler: Callable[..., jnp.ndarray],
) -> SubDataset:
  """Continuous-domain BO against a query oracle.

  Per iteration: sample a candidate pool, take the acquisition argmax as
  the start point, refine with bounded L-BFGS-B in [0,1]^d, query the
  oracle, append the observation. Random search skips the refinement
  (the reference at hyperbo/bo_utils/bayesopt.py:122-125 "refines" the
  randomly chosen point against the noise-valued rand acquisition —
  a latent bug; a random baseline must stay random).
  """
  input_dim = model.input_dim

  def propose(subkey, i):
    start_time = time.time()
    sample_key, select_key = jax.random.split(subkey)
    x_samples = input_sampler(sample_key, input_dim)
    select_idx = _argmax_or_random(model, sub_dataset_key, ac_func,
                                   x_samples, select_key)
    x_init = x_samples[select_idx]

    def neg_ac(x):
      return -ac_func(
          model=model, sub_dataset_key=sub_dataset_key,
          x_queries=x[None, :]).flatten()[0]

    x_opt = (x_init if _skips_refinement(ac_func)
             else _lbfgsb_refine(neg_ac, x_init, input_dim))
    datapoint = (x_opt, query_oracle(x_opt[None, :]))
    logging.info('%d-th iter, x_init=%s, eval_datapoint=%s, elapsed=%f',
                 i, x_init, datapoint, time.time() - start_time)
    return datapoint

  return _bo_iterations(model, sub_dataset_key, iters, propose, key)


def simulated_bayesopt(
    model: gp.GP,
    sub_dataset_key: Union[int, str],
    queried_sub_dataset: SubDataset,
    ac_func: Callable[..., jnp.ndarray],
    iters: int,
    random_key: Optional[jax.Array] = None,
    get_params_path: Optional[Callable[..., Any]] = None,
    callback: Optional[Callable[..., Any]] = None,
) -> SubDataset:
  """Offline BO over a finite pre-evaluated candidate set."""

  def propose(subkey, _):
    select_idx = _argmax_or_random(model, sub_dataset_key, ac_func,
                                   queried_sub_dataset.x, subkey)
    return (queried_sub_dataset.x[select_idx],
            queried_sub_dataset.y[select_idx])

  return _bo_iterations(model, sub_dataset_key, iters, propose,
                        random_key, get_params_path=get_params_path,
                        callback=callback)


def _build_model(method, dataset, mean_func, cov_func, init_params,
                 warp_func):
  """GP or HGP per method registry; HGP forces the sampling config."""
  from hyperbo_tpu.bo import const  # deferred: const imports data loaders

  if method in const.USE_HGP:
    init_params.config.update(_HGP_SAMPLING_CONFIG,
                              priors=priors.DEFAULT_PRIORS)
    model_class = gp.HGP
  else:
    model_class = gp.GP
  return model_class(dataset=dataset, mean_func=mean_func,
                     cov_func=cov_func, params=init_params,
                     warp_func=warp_func)


def run_bayesopt(
    dataset: defs.AllowedDatasetTypes,
    sub_dataset_key: str,
    queried_sub_dataset: Union[SubDataset, Callable[[Any], Any]],
    mean_func: Callable[..., jnp.ndarray],
    cov_func: Callable[..., jnp.ndarray],
    init_params: defs.GPParams,
    ac_func: Callable[..., jnp.ndarray],
    iters: int,
    warp_func: defs.WarpFuncType = None,
    init_random_key: Optional[jax.Array] = None,
    method: str = 'hyperbo',
    init_model: bool = False,
    data_loader_name: str = '',
    get_params_path: Optional[Callable[..., Any]] = None,
    callback: Optional[Callable[..., Any]] = None,
    save_retrain_model: bool = False,
):
  """BO experiment entry point.

  Returns ((x_observed, y_observed), best_query, model_params). The best
  query is None on the continuous-oracle path.
  """
  from hyperbo_tpu.bo import input_samplers

  logging.info('run_bayesopt is using method %s.', method)
  model = _build_model(method, dataset, mean_func, cov_func, init_params,
                       warp_func)
  key = init_random_key
  if init_model:
    assert init_random_key is not None, (
        'Cannot initialize with init_random_key == None.')
    key, subkey = jax.random.split(key)
    model.initialize_params(subkey)
    key, subkey = jax.random.split(key)
    model.train(subkey, get_params_path, callback=callback)
  else:
    key, subkey = jax.random.split(key)
    model.rng = subkey

  if isinstance(queried_sub_dataset, SubDataset):
    sub_dataset = simulated_bayesopt(
        model=model,
        sub_dataset_key=sub_dataset_key,
        queried_sub_dataset=queried_sub_dataset,
        ac_func=ac_func,
        iters=iters,
        random_key=key,
        get_params_path=get_params_path if save_retrain_model else None,
        callback=callback if save_retrain_model else None)
    return ((sub_dataset.x, sub_dataset.y),
            get_best_datapoint(queried_sub_dataset), model.params)

  if data_loader_name not in input_samplers.INPUT_SAMPLERS:
    raise NotImplementedError(
        f'Input sampler for {data_loader_name} not found.')
  sub_dataset = bayesopt(
      key=key,
      model=model,
      sub_dataset_key=sub_dataset_key,
      query_oracle=queried_sub_dataset,
      ac_func=ac_func,
      iters=iters,
      input_sampler=input_samplers.INPUT_SAMPLERS[data_loader_name])
  return (sub_dataset.x, sub_dataset.y), None, model.params


def with_task_context(x, task_id: int, num_tasks: int) -> np.ndarray:
  """Append a one-hot task indicator to each input row.

  The contextual/MTBO baselines (reference
  hyperbo/bo_utils/bayesopt.py:305-344) model all tasks with one GP
  whose inputs carry the task identity as extra dimensions.
  """
  x = np.asarray(x)
  ctx = np.broadcast_to(np.eye(num_tasks, dtype=x.dtype)[task_id],
                        (x.shape[0], num_tasks))
  return np.concatenate([x, ctx], axis=1)
