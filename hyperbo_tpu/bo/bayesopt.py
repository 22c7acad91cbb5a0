"""Bayesian-optimization loops for sequential queries.

API parity with reference hyperbo/bo_utils/bayesopt.py:36-345: the same
three loops —

  * `bayesopt`: continuous-oracle BO (candidate pool -> acquisition argmax
    -> bounded L-BFGS-B refinement -> oracle query -> append),
  * `simulated_bayesopt`: offline BO over a finite pre-evaluated set,
  * `run_bayesopt`: experiment entry point (GP vs HGP dispatch,
    pre-training, simulated vs oracle path)

— plus the contextual/MTBO helpers. The L-BFGS-B refinement uses scipy
with a jitted JAX value-and-grad (the reference used jaxopt's scipy
wrapper). For the fully on-device scan-based loop with rank-1 posterior
updates, see hyperbo_tpu.bo.ondevice.
"""

from __future__ import annotations

import dataclasses
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
  """Retrain on the growing test sub-dataset if config['retrain'] > 0."""
  retrain_condition = ('retrain' in model.params.config and
                       model.params.config['retrain'] > 0 and
                       model.dataset[sub_dataset_key].x.shape[0] > 0)
  if not retrain_condition:
    return
  if model.params.config['objective'] in [obj.regkl, obj.regeuc]:
    raise ValueError('Objective must include NLL to retrain.')
  max_training_step = model.params.config['retrain']
  logging.info('Retraining with max_training_step = %d.', max_training_step)
  model.params.config['max_training_step'] = max_training_step
  model.train(random_key, get_params_path=get_params_path, callback=callback)


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
  oracle, append the observation.
  """
  input_dim = model.input_dim
  for i in range(iters):
    start_time = time.time()
    retrain_model(model, sub_dataset_key=sub_dataset_key)
    key, subkey = jax.random.split(key)
    x_samples = input_sampler(subkey, input_dim)
    if ac_func.__name__ in ('rand', 'random_search'):
      logging.info('Using random search for bayesopt.')
      key, subkey = jax.random.split(key)
      select_idx = jax.random.choice(subkey, x_samples.shape[0])
    else:
      evals = ac_func(
          model=model, sub_dataset_key=sub_dataset_key, x_queries=x_samples)
      select_idx = evals.argmax()
    x_init = x_samples[select_idx]

    def neg_ac(x):
      return -ac_func(
          model=model, sub_dataset_key=sub_dataset_key,
          x_queries=x[None, :]).flatten()[0]

    x_opt = _lbfgsb_refine(neg_ac, x_init, input_dim)
    eval_datapoint = x_opt, query_oracle(x_opt[None, :])
    logging.info('%d-th iter, x_init=%s, eval_datapoint=%s, elapsed=%f',
                 i, x_init, eval_datapoint, time.time() - start_time)
    model.update_sub_dataset(
        eval_datapoint, sub_dataset_key=sub_dataset_key, is_append=True)

  return model.dataset.get(sub_dataset_key,
                           SubDataset(jnp.empty(0), jnp.empty(0)))


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
  for _ in range(iters):
    if random_key is not None:
      random_key, subkey = jax.random.split(random_key)
    else:
      subkey = None
    retrain_model(
        model, sub_dataset_key=sub_dataset_key, random_key=subkey,
        get_params_path=get_params_path, callback=callback)
    if ac_func.__name__ in ('rand', 'random_search'):
      logging.info('Using random search for bayesopt.')
      if random_key is None:
        raise ValueError('Must specify a random key for random search.')
      random_key, subkey = jax.random.split(random_key)
      select_idx = jax.random.choice(subkey, queried_sub_dataset.x.shape[0])
    else:
      evals = ac_func(
          model=model, sub_dataset_key=sub_dataset_key,
          x_queries=queried_sub_dataset.x)
      select_idx = evals.argmax()
    eval_datapoint = (queried_sub_dataset.x[select_idx],
                      queried_sub_dataset.y[select_idx])
    model.update_sub_dataset(
        eval_datapoint, sub_dataset_key=sub_dataset_key, is_append=True)

  return model.dataset.get(sub_dataset_key,
                           SubDataset(jnp.empty(0), jnp.empty(0)))


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
  from hyperbo_tpu.bo import const  # deferred: const imports data loaders
  from hyperbo_tpu.bo import input_samplers

  logging.info('run_bayesopt is using method %s.', method)
  if method in const.USE_HGP:
    model_class = gp.HGP
    init_params.config.update({
        'objective': 'nll',
        'method': 'slice_sample',
        'burnin': 50,
        'nsamples': 50,
        'priors': priors.DEFAULT_PRIORS,
    })
  else:
    model_class = gp.GP

  model = model_class(
      dataset=dataset,
      mean_func=mean_func,
      cov_func=cov_func,
      params=init_params,
      warp_func=warp_func)
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
    best_query = get_best_datapoint(queried_sub_dataset)
    sub_dataset = simulated_bayesopt(
        model=model,
        sub_dataset_key=sub_dataset_key,
        queried_sub_dataset=queried_sub_dataset,
        ac_func=ac_func,
        iters=iters,
        random_key=key,
        get_params_path=get_params_path if save_retrain_model else None,
        callback=callback if save_retrain_model else None)
    return (sub_dataset.x, sub_dataset.y), best_query, model.params

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


def _onehot_matrix(shape, idx) -> np.ndarray:
  """Rows are one-hot vectors with idx-th element 1 (task indicators)."""
  zeros = np.zeros(shape)
  zeros[:, idx] = 1
  return zeros


def _subdataset_to_arrays(ds: SubDataset, dataset_id: int,
                          num_datasets: int) -> Tuple[np.ndarray, np.ndarray]:
  """Append a one-hot task indicator to x (contextual/MTBO baselines)."""
  onehot = _onehot_matrix((ds.y.shape[0], num_datasets), dataset_id)
  return np.concatenate([ds.x, onehot], axis=1), ds.y


@dataclasses.dataclass
class _XYPair:
  """Keep an (x, y) array pair in sync under append/delete."""
  x: np.ndarray
  y: np.ndarray

  def append_xy(self, other, idx: int) -> None:
    self.x = np.concatenate([self.x, other.x[idx:idx + 1, :]], axis=0)
    self.y = np.concatenate([self.y, other.y[idx:idx + 1, :]], axis=0)

  def delete(self, idx: int) -> None:
    self.x = np.delete(self.x, idx, 0)
    self.y = np.delete(self.y, idx, 0)

  def concat(self, other) -> '_XYPair':
    return _XYPair(
        x=np.concatenate([self.x, other.x]),
        y=np.concatenate([self.y, other.y]))

  def empty_like(self) -> '_XYPair':
    return _XYPair(
        x=np.zeros((0, self.x.shape[1])), y=np.zeros((0, self.y.shape[1])))

  @property
  def size(self):
    return self.x.shape[0]
