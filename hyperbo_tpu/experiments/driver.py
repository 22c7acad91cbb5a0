"""BO experiment driver: dataset -> pre-train -> BO -> result pickles.

The OSS reference's analysis layer consumes result files produced by an
internal driver (`synthetic.py`, referenced at
hyperbo/plot_utils/bayesopt_results.py:30 but absent from the release —
SURVEY.md section 2 missing-in-OSS). This module reconstructs that
component: it runs one (method, acquisition, seed) BO experiment and
writes `result.pkl` files in exactly the format
hyperbo_tpu.analysis.bayesopt_results reads (observations / queries /
sub_dataset_key / best_query / params_dict).

Methods (names from bo.const):
  rand        random search
  stbo        single-task BO: no history, retrain on the test task
  mtbo        contextual multi-task baseline: one-hot task features
  hyperbo     pre-trained GP (NLL/EKL objective per init_params config)
  hyperbo_ss  pre-trained HGP via slice sampling

Usage:
  python -m hyperbo_tpu.experiments.driver --data_loader random \
      --method hyperbo --ac_func expected_improvement --iters 20 \
      --output_dir /tmp/exp --run_id 1
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyperbo_tpu.core import defs
from hyperbo_tpu.models import divergences
from hyperbo_tpu.models import gp
from hyperbo_tpu.bo import bayesopt
from hyperbo_tpu.bo import const

GPParams = defs.GPParams
SubDataset = defs.SubDataset


def default_init_params(method: str, objective: str = 'nll',
                        max_training_step: int = 200,
                        retrain: int = 0) -> GPParams:
  """Reasonable training config per method."""
  config = {
      'method': 'adam',
      'learning_rate': 1e-2,
      'max_training_step': max_training_step,
      'batch_size': 100,
      'objective': objective,
      'tol': 1e-6,
      'retrain': retrain,
      'mlp_features': (8, 8),
  }
  if method == const.STBO:
    config.update({'max_training_step': 0, 'retrain': 50})
  model = {'constant': 0., 'lengthscale': 0., 'signal_variance': 0.,
           'noise_variance': -4.}
  return GPParams(model=model, config=config)


def _contextual_dataset(dataset, sub_dataset_key):
  """MTBO baseline: concatenate one-hot task indicators onto x."""
  unaligned = {k: v for k, v in dataset.items() if v.aligned is None}
  keys = list(unaligned.keys())
  num = len(keys) + 1  # + the test task slot
  xs, ys = [], []
  for i, k in enumerate(keys):
    xs.append(bayesopt.with_task_context(unaligned[k].x, i, num))
    ys.append(np.asarray(unaligned[k].y))
  merged = SubDataset(jnp.asarray(np.concatenate(xs)),
                      jnp.asarray(np.concatenate(ys)))
  return {0: merged}, len(keys)


# ACFUN registry name -> bo.ondevice acquisition key.
_ONDEVICE_ACQ = {
    'expected_improvement': 'ei',
    'probability_of_improvement': 'pi',
    'random_search': 'rand',
    'thompson_sampling': 'ts',
}


def _run_ondevice(method, dataset, mean_func, cov_func, init_params,
                  warp_func, queried, iters, ac_func_name, key,
                  init_model, sub_dataset_key):
  """Pre-train as usual, then run the BO loop as one on-device scan.

  Covers the offline (simulated) path for GP and HGP methods — the
  production TPU loop (bo/ondevice.py): rank-1 Cholesky appends,
  batched candidate scoring, no host sync until the loop ends.
  Existing observations on the test sub-dataset seed the loop; the
  rand method maps to the on-device rand baseline. config['retrain']
  > 0 (e.g. method=stbo) routes GP methods to the in-scan retraining
  variant (model params + Adam state in the scan carry, the host
  loop's per-iteration retrain_model semantics).
  """
  from hyperbo_tpu.bo import ondevice as ondevice_lib

  retrain = init_params.config.get('retrain', 0)
  acq = ('rand' if method == const.RAND
         else _ONDEVICE_ACQ.get(ac_func_name, ac_func_name))
  model = bayesopt._build_model(method, dataset, mean_func, cov_func,
                                init_params, warp_func)
  if init_model:
    key, sk = jax.random.split(key)
    model.initialize_params(sk)
    key, sk = jax.random.split(key)
    model.train(sk)
  if retrain > 0:
    _, dropped = ondevice_lib.default_retrain_corpus(
        model.dataset, sub_dataset_key)
    if dropped:
      logging.warning(
          'on-device retraining corpus excludes %d sub-dataset(s) %s '
          '(aligned/multi-draw/empty tasks pack into the NLL corpus '
          'only as single-output unaligned data); the host loop would '
          'include them via its EKL/NLL combinators.', len(dropped),
          dropped[:8])
  return ondevice_lib.run_bayesopt_ondevice(
      model, sub_dataset_key, queried, iters, acquisition=acq, key=key)


def run_experiment(
    data_loader_name: str,
    method: str,
    ac_func_name: str,
    iters: int,
    seed: int,
    output_dir: Optional[str] = None,
    run_id: int = 1,
    sub_dataset_key=None,
    init_params: Optional[GPParams] = None,
    mean_func_name: str = 'linear_mlp',
    cov_func_name: str = 'squared_exponential_mlp',
    ondevice: bool = False,
    dataset_kwargs: Optional[Dict[str, Any]] = None,
    verbose: bool = True,
) -> Dict[str, Any]:
  """Run one BO experiment; returns (and optionally saves) the result."""
  key = jax.random.PRNGKey(seed)
  key, data_key = jax.random.split(key)

  dataset_kwargs = dict(dataset_kwargs or {})
  if data_loader_name == 'random':
    gt = dataset_kwargs.pop('ground_truth', None)
    if gt is None:
      dim = dataset_kwargs.pop('dim', 2)
      gt = GPParams(model={
          'constant': 1., 'lengthscale': jnp.ones(dim) * .3,
          'signal_variance': 1., 'noise_variance': 1e-4})
      dataset_kwargs['dim'] = dim
    from hyperbo_tpu.models import kernel as kernel_lib
    from hyperbo_tpu.models import mean as mean_lib
    dataset, sub_dataset_key, queried = const.HYPERBO_DATASETS['random'](
        data_key, mean_lib.constant, kernel_lib.matern52, gt,
        n_observed=dataset_kwargs.pop('n_observed', 0),
        n_queries=dataset_kwargs.pop('n_queries', 100),
        n_func_historical=dataset_kwargs.pop('n_func_historical', 8),
        m_points_historical=dataset_kwargs.pop('m_points_historical', 30),
        **dataset_kwargs)
  elif data_loader_name == 'hpob':
    dataset, sub_dataset_key, queried = const.HYPERBO_DATASETS['hpob'](
        data_key, verbose=verbose, **dataset_kwargs)
  else:
    dataset, sub_dataset_key, queried = const.HYPERBO_DATASETS[
        data_loader_name](data_key, sub_dataset_key=sub_dataset_key,
                          verbose=verbose, **dataset_kwargs)

  if init_params is None:
    init_params = default_init_params(method)

  warp_func = divergences.DEFAULT_WARP_FUNC
  mean_func = const.MEAN[mean_func_name]
  cov_func = const.KERNEL[cov_func_name]

  if method == const.RAND:
    ac_func = const.ACFUN['random_search']
    init_model = False
  else:
    ac_func = const.ACFUN[ac_func_name]
    init_model = method not in (const.RAND,)

  num_tasks = None
  if method == const.MTBO:
    dataset, num_tasks = _contextual_dataset(dataset, sub_dataset_key)
    # Pad queried x with the test task's one-hot context.
    queried = SubDataset(
        jnp.asarray(bayesopt.with_task_context(
            queried.x, num_tasks, num_tasks + 1)),
        queried.y)
    sub_dataset_key = 'mtbo_test'
  elif method == const.STBO:
    # Single-task BO: start from an empty test sub-dataset; params are
    # still shape-initialized (init_model=True with max_training_step=0,
    # see default_init_params) so retraining during BO can fit them.
    dataset = {sub_dataset_key: SubDataset(
        jnp.zeros((0, queried.x.shape[1])), jnp.zeros((0, 1)))}
    init_model = True

  t0 = time.time()
  key, bo_key = jax.random.split(key)
  if ondevice and isinstance(queried, SubDataset):
    observations, best_query, params = _run_ondevice(
        method, dataset, mean_func, cov_func, init_params, warp_func,
        queried, iters, ac_func_name, bo_key, init_model,
        sub_dataset_key)
  else:
    observations, best_query, params = bayesopt.run_bayesopt(
        dataset=dataset,
        sub_dataset_key=sub_dataset_key,
        queried_sub_dataset=queried,
        mean_func=mean_func,
        cov_func=cov_func,
        init_params=init_params,
        ac_func=ac_func,
        iters=iters,
        warp_func=warp_func,
        init_random_key=bo_key,
        method=method,
        init_model=init_model,
        data_loader_name=data_loader_name)
  elapsed = time.time() - t0

  result = {
      'observations': observations,
      'queries': (queried.x, queried.y),
      'sub_dataset_key': sub_dataset_key,
      'best_query': best_query,
      'method': method,
      'ac_func': ac_func_name,
      'seed': seed,
      'iters': iters,
      'elapsed': elapsed,
      'params_dict': jax.tree.map(
          lambda v: np.asarray(v) if isinstance(v, jnp.ndarray) else v,
          dict(params.model)),
  }
  if output_dir:
    dirnm = os.path.join(output_dir, str(run_id))
    os.makedirs(dirnm, exist_ok=True)
    with open(os.path.join(dirnm, 'result.pkl'), 'wb') as f:
      pickle.dump(result, f)
    if verbose:
      print(f'wrote {dirnm}/result.pkl ({elapsed:.1f}s)')
  return result


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--data_loader', default='random',
                      choices=list(const.HYPERBO_DATASETS))
  parser.add_argument('--method', default=const.HBO,
                      choices=const.OFFLINE_METHODS + [const.HBO_NLL])
  parser.add_argument('--ac_func', default='expected_improvement',
                      choices=list(const.ACFUN))
  parser.add_argument('--iters', type=int, default=20)
  parser.add_argument('--seed', type=int, default=0)
  parser.add_argument('--output_dir', default=None)
  parser.add_argument('--run_id', type=int, default=1)
  parser.add_argument('--mean_func', default='linear_mlp')
  parser.add_argument('--cov_func', default='squared_exponential_mlp')
  parser.add_argument('--fused_mll', action='store_true',
                      help='route large-n SE-family NLLs through the '
                           'fused Pallas kernel (value + gradient)')
  parser.add_argument('--ondevice', action='store_true',
                      help='run the BO loop as one on-device scan '
                           '(offline path; config["retrain"]>0 uses '
                           'the in-scan retraining variant)')
  args = parser.parse_args()
  init_params = None
  if args.fused_mll:
    init_params = default_init_params(args.method)
    init_params.config['fused_mll'] = True
  result = run_experiment(
      data_loader_name=args.data_loader, method=args.method,
      ac_func_name=args.ac_func, iters=args.iters, seed=args.seed,
      output_dir=args.output_dir, run_id=args.run_id,
      mean_func_name=args.mean_func, cov_func_name=args.cov_func,
      ondevice=args.ondevice, init_params=init_params)
  ys = np.asarray(result['observations'][1]).flatten()
  print(f"method={args.method} best_y={ys.max():.4f} "
        f"final_regret="
        f"{float(np.max(result['queries'][1]) - ys.max()):.4f}")


if __name__ == '__main__':
  main()
