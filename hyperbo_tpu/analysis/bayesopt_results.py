"""BO experiment result aggregation and analysis.

Behavioral parity with reference hyperbo/plot_utils/bayesopt_results.py:
29-489 — experiment-key decoding, parallel result-file loading, regret
computation (running best vs achievable max), per-workload percentile
analysis, and performance-profile fractions. Regret sequences are
computed with vectorized running maxima (np.maximum.accumulate) instead
of the reference's per-prefix max loops.
"""

from __future__ import annotations

import collections
import concurrent.futures
import logging
import os
from typing import Any, Dict, List, Optional

import numpy as np

from hyperbo_tpu.core import params_io

# PD1 workload key -> display name (24 workloads; the reference excludes
# the low-data imagenet_resnet50@1024 workload).
WORKLOAD2NAME = {
    'cifar10_wrn,cifar10,wide_resnet,wrn,2048': 'CIFAR10 WRN 2048',
    'cifar10_wrn,cifar10,wide_resnet,wrn,256': 'CIFAR10 WRN 256',
    'cifar100_wrn,cifar100,wide_resnet,wrn,2048': 'CIFAR100 WRN 2048',
    'cifar100_wrn,cifar100,wide_resnet,wrn,256': 'CIFAR100 WRN 256',
    'fashion_maxp_cnn,fashion_mnist,max_pooling_cnn,max_pool_relu,2048':
        'Fashion CNNPoolReLU 2048',
    'fashion_maxp_cnn,fashion_mnist,max_pooling_cnn,max_pool_relu,256':
        'Fashion CNNPoolReLU 256',
    'fashion_maxp_cnn,fashion_mnist,max_pooling_cnn,max_pool_tanh,2048':
        'Fashion CNNPoolTanh 2048',
    'fashion_maxp_cnn,fashion_mnist,max_pooling_cnn,max_pool_tanh,256':
        'Fashion CNNPoolTanh 256',
    'fashion_smpl_cnn,fashion_mnist,simple_cnn,simple_cnn,2048':
        'Fashion CNNReLU 2048',
    'fashion_smpl_cnn,fashion_mnist,simple_cnn,simple_cnn,256':
        'Fashion CNNReLU 256',
    'imagenet_resnet50,imagenet,resnet,resnet50,256':
        'ImageNet ResNet50 256',
    'imagenet_resnet50,imagenet,resnet,resnet50,512':
        'ImageNet ResNet50 512',
    'lm1b_trfmr,lm1b,transformer,transformer,2048':
        'LM1B Transformer 2048',
    'mnist_maxp_cnn,mnist,max_pooling_cnn,max_pool_relu,2048':
        'MNIST CNNPoolReLU 2048',
    'mnist_maxp_cnn,mnist,max_pooling_cnn,max_pool_relu,256':
        'MNIST CNNPoolReLU 256',
    'mnist_maxp_cnn,mnist,max_pooling_cnn,max_pool_tanh,2048':
        'MNIST CNNPoolTanh 2048',
    'mnist_maxp_cnn,mnist,max_pooling_cnn,max_pool_tanh,256':
        'MNIST CNNPoolTanh 256',
    'mnist_simple_cnn,mnist,simple_cnn,simple_cnn,2048':
        'MNIST CNNReLU 2048',
    'mnist_simple_cnn,mnist,simple_cnn,simple_cnn,256':
        'MNIST CNNReLU 256',
    'svhn_noextra_wrn,svhn_no_extra,wide_resnet,wrn,1024':
        'SVHN WRN 1024',
    'svhn_noextra_wrn,svhn_no_extra,wide_resnet,wrn,256':
        'SVHN WRN 256',
    'uniref50_trfmr,uniref50,transformer,transformer,128':
        'Uniref50 Transformer 128',
    'wmt15_de_en_xfmr,translate_wmt,xformer_translate,xformer,64':
        'WMT XFormer 64',
}

EXCLUDED_WORKLOAD = 'imagenet_resnet50,imagenet,resnet,resnet50,1024'


def decode_exp_key(exp_key: str, data_loader_name: str):
  """Decode an experiment key into (acfun, num_remove, test index, rest)."""
  elements = exp_key.split('-')
  if data_loader_name == 'pd1':
    (test_dataset_index, seed, mean_func_name, cov_func_name, mlp_features,
     objective, opt_method, max_training_step, batch_size, num_remove,
     p_observed, p_remove, _, _, acfun, method) = elements
    return acfun, int(num_remove), test_dataset_index, '-'.join(
        (seed, mean_func_name, cov_func_name, mlp_features, objective,
         opt_method, max_training_step, batch_size, p_observed, p_remove,
         method))
  if 'hpob' in data_loader_name:
    return None
  raise NotImplementedError(f'{data_loader_name} not implemented.')


def run_in_parallel(function, list_of_kwargs_to_function, num_workers):
  """Run function over a kwargs list with a thread pool; raise on error."""
  if num_workers < 1:
    raise ValueError(
        f'Number of workers must be greater than 0. Was {num_workers}')
  with concurrent.futures.ThreadPoolExecutor(num_workers) as executor:
    futures = [executor.submit(function, **kwargs)
               for kwargs in list_of_kwargs_to_function]
    for f in concurrent.futures.as_completed(futures):
      if f.exception():
        raise f.exception()
  return [f.result() for f in futures]


def regret_sequence(yy: np.ndarray, maxy: float) -> np.ndarray:
  """Regret after each observation: maxy - running max (vectorized)."""
  return maxy - np.maximum.accumulate(np.asarray(yy, np.float64))


def get_model(dirnm, unique_id, verbose, filenm='result.pkl', retry=True):
  """Load one run's saved model params keyed by (workload, unique_id)."""
  file = os.path.join(dirnm, filenm)
  res = params_io.load_params(file, use_gpparams=False)
  if not res and not retry:
    if verbose:
      print(f'{filenm} empty')
    return None
  workload_key = 'sub_dataset_key'
  if workload_key not in res:
    if 'subdataset_key' in res:
      workload_key = 'subdataset_key'
    else:
      logging.warning('%s wrong format; keys=%s', filenm, res.keys())
      return None
  return (str(res[workload_key]), unique_id), res['params_dict']


def get_exp_result(dirnm, unique_id, verbose, filenm='result.pkl',
                   retry=True, maf=False):
  """Load one run's result file -> ((workload, id), (regrets, yy, maxy))."""
  file = os.path.join(dirnm, filenm)
  res = params_io.load_from_file(file)
  if not res and not retry:
    return None
  yy = np.asarray(res['observations'][1]).flatten()
  yq = np.asarray(res['queries'][1]).flatten()

  workload_key = 'sub_dataset_key'
  if workload_key not in res:
    if 'subdataset_key' in res:
      workload_key = 'subdataset_key'
    else:
      logging.warning('%s wrong format; keys=%s', filenm, res.keys())
      return None
  workload = str(res[workload_key])
  if workload == EXCLUDED_WORKLOAD:
    return None
  if maf:
    yy = -np.log((1 - yy) + 1e-10)
    yq = -np.log((1 - yq) + 1e-10)

  maxy = max(yy.max(), yq.max())
  regret_array = regret_sequence(yy, maxy)
  if verbose:
    print(f'filenm={filenm}, dirnm={dirnm}, len(regret)='
          f'{len(regret_array)}, final regret={regret_array[-1]}')
  if maf and len(regret_array) < 100:
    return None
  return (workload, unique_id), (list(regret_array), yy, maxy)


def add_regret_array(res):
  """Attach regret_array/maxy to a result dict with observations."""
  yy = np.asarray(res['observations'][1]).flatten()
  best_query_y = res['best_query'][1]
  maxy = max(yy.max(), float(np.max(best_query_y)))
  res['regret_array'] = list(regret_sequence(yy, maxy))
  res['maxy'] = maxy
  return res


def process_results(results, verbose=True):
  """Attach regret arrays to a dict of result dicts."""
  if not results:
    return None
  for exp_key, res in results.items():
    res = add_regret_array(res)
    if verbose:
      print(f'exp_key={exp_key}, len(regret)={len(res["regret_array"])}, '
            f'final regret={res["regret_array"][-1]}')
  return results


def hpob_output_warper_inverse(y):
  """Inverse of the hpob output log-warp."""
  return -np.exp(-np.asarray(y)) + 1e-6 + 1.


def get_hpob_exp(kwarg, verbose=True):
  """Load one hpob result file and attach regrets per experiment."""
  filenm, unique_id = kwarg['filenm'], kwarg['unique_id']
  results = params_io.load_params(
      filenm, use_gpparams=False, include_state=True)
  if not results:
    return None
  results = results[1]
  exp_key = None
  regret_array = []
  for exp, res in results.items():
    key0 = exp[0]
    yy = np.asarray(res['observations'][1]).flatten()
    best_query_y = res['best_query'][1]
    if 'output_log_warp' in key0:
      yy = hpob_output_warper_inverse(yy)
      best_query_y = hpob_output_warper_inverse(best_query_y)
    exp_key = '-'.join((res['search_space'], res['sub_dataset_key']))
    maxy = max(yy.max(), float(np.max(best_query_y)))
    res['regret_array'] = list(regret_sequence(yy, maxy))
    res['yy'] = yy
    res['maxy'] = maxy
    regret_array = res['regret_array']
  if verbose:
    print(f'filenm={filenm}, len(regret)={len(regret_array)}')
  return (exp_key, unique_id), results


def get_multi_hpob_exp(kwargs):
  return [get_hpob_exp(kwarg) for kwarg in kwargs]


def hpob_results(kwargs, verbose=False, process_func=get_multi_hpob_exp,
                 n=100, parallel=True):
  """Aggregate hpob result files, n per worker chunk."""
  kwarg_list, sub_list = [], []
  for cnt, kwarg in enumerate(kwargs, 1):
    kwarg['verbose'] = verbose
    sub_list.append(kwarg)
    if cnt % n == 0:
      kwarg_list.append({'kwargs': sub_list})
      sub_list = []
  if sub_list:
    kwarg_list.append({'kwargs': sub_list})
  if parallel:
    results = run_in_parallel(process_func, kwarg_list,
                              max(1, min(len(kwargs) // n, 100)))
  else:
    results = [process_func(**kwarg) for kwarg in kwarg_list]
  return dict(r for sub in results for r in sub if r is not None)


def get_results(directory, n, verbose=False, process_func=get_exp_result):
  """Aggregate n result files (directory/1..n/result.pkl) in parallel."""
  kwarg_list = [{'dirnm': os.path.join(directory, str(i + 1)),
                 'unique_id': i, 'verbose': verbose} for i in range(n)]
  results = run_in_parallel(process_func, kwarg_list, min(n, 100))
  return dict(r for r in results if r is not None)


def get_workload2result(res, error_rate, best_only=True, use_name=True,
                        max_training_step=100):
  """Map workload -> {method: list of best (or sequences of) metrics}."""
  workload2result = collections.defaultdict(dict)
  for method in res:
    teststudy2y_array = res[method]
    for wl, i in teststudy2y_array:
      wl = str(wl)
      workload2result[wl].setdefault(method, [])
      if error_rate:
        yy = np.asarray(teststudy2y_array[(wl, i)][1])
        yy = np.exp(-yy) - 1e-10  # invert the -log output warp
        if best_only:
          workload2result[wl][method].append(yy[:max_training_step].min())
        else:
          workload2result[wl][method].append(yy)
      else:
        regret = teststudy2y_array[(wl, i)][0]
        if best_only:
          workload2result[wl][method].append(regret[max_training_step - 1])
        else:
          workload2result[wl][method].append(regret)
  if use_name:
    workload2result = {
        WORKLOAD2NAME[wl]: workload2result[wl] for wl in workload2result}
  return workload2result


def analyze_results(res, percentile=20, error_rate=True,
                    max_training_step=100):
  """Per workload & method: (mean, std, lower pct, median, upper pct)."""
  workload2result = get_workload2result(
      res, error_rate, best_only=True, max_training_step=max_training_step)
  for method in res:
    for wl in workload2result:
      if method in workload2result[wl]:
        final = np.array(workload2result[wl][method])
        lower, median, upper = np.percentile(
            final, [percentile, 50, 100 - percentile], axis=0)
        workload2result[wl][method] = (final.mean(axis=0),
                                       final.std(axis=0), lower, median,
                                       upper)
      else:
        workload2result[wl][method] = []
  return workload2result


def compute_workload2ref(workload2result, methods, trial=100,
                         ref_metric='median'):
  """Per-workload reference values for performance profiles."""
  workload2ref = {}
  for wl in workload2result:
    y_arrays = []
    for method in methods:
      y_arrays += workload2result[wl][method]
    y_arrays = np.array(y_arrays)[:, :trial]
    if ref_metric == 'median':
      workload2ref[wl] = np.median(np.amin(y_arrays, 1))
    elif ref_metric == 'mean':
      workload2ref[wl] = np.mean(np.amin(y_arrays, 1))
    elif isinstance(ref_metric, float):
      workload2ref[wl] = ref_metric * y_arrays.min()
  return workload2ref


def get_method2fraction(workload2result, workload2ref, bo_iters=100):
  """Performance profile: fraction of runs at/below reference per iter."""
  method2fraction = collections.defaultdict(lambda: np.zeros(bo_iters))
  total = collections.defaultdict(int)
  for wl in workload2result:
    for method, result in workload2result[wl].items():
      for yy in result:
        total[method] += 1
        running_min = np.minimum.accumulate(np.asarray(yy)[:bo_iters])
        hits = running_min <= workload2ref[wl] + 1e-6
        method2fraction[method][:len(hits)] += hits
  for method in method2fraction:
    method2fraction[method] = method2fraction[method] / total[method]
  return method2fraction


def summarize_results_dir(root, percentiles=(20, 50, 80), verbose=True):
  """Aggregate every result.pkl under `root` into regret percentiles.

  Walks the experiment driver's output layout (root/<run_id>/result.pkl,
  any nesting), attaches regret arrays (add_regret_array) and reports
  the regret-at-final-iteration percentiles plus a per-iteration median
  curve — the quality protocol of the reference's analysis layer
  (hyperbo/plot_utils/bayesopt_results.py:358-434) without needing a
  notebook.

  Returns (summary dict, list of per-run result dicts).
  """
  runs = []
  for dirpath, _, filenames in os.walk(root):
    if 'result.pkl' in filenames:
      path = os.path.join(dirpath, 'result.pkl')
      try:
        res = params_io.load_from_file(path)
        if res and 'observations' in res:
          runs.append(add_regret_array(res))
      except Exception as e:  # noqa: BLE001 — skip partial/foreign files
        logging.warning('skipping %s (%s: %s)', path,
                        type(e).__name__, e)
  if not runs:
    return None, []
  finals = np.asarray([r['regret_array'][-1] for r in runs])
  min_len = min(len(r['regret_array']) for r in runs)
  curves = np.asarray([r['regret_array'][:min_len] for r in runs])
  summary = {
      'num_runs': len(runs),
      'final_regret_percentiles': {
          int(p): float(np.percentile(finals, p)) for p in percentiles},
      'median_regret_curve': np.median(curves, axis=0).tolist(),
  }
  if verbose:
    pcts = ', '.join(f'p{p}={v:.4g}' for p, v in
                     summary['final_regret_percentiles'].items())
    print(f'{len(runs)} runs under {root}: final regret {pcts}')
  return summary, runs


def main():
  """CLI: `python -m hyperbo_tpu.analysis.bayesopt_results <dir>`."""
  import argparse
  parser = argparse.ArgumentParser(
      description='Summarize experiment-driver result.pkl files.')
  parser.add_argument('root', help='directory tree containing result.pkl '
                                   'files (the driver\'s --output_dir)')
  parser.add_argument('--percentiles', type=int, nargs='+',
                      default=[20, 50, 80])
  args = parser.parse_args()
  summary, _ = summarize_results_dir(args.root,
                                     percentiles=args.percentiles)
  if summary is None:
    print(f'no result.pkl files found under {args.root}')
    raise SystemExit(1)
  curve = summary['median_regret_curve']
  show = ' '.join(f'{v:.4g}' for v in curve[:10])
  print(f'median regret curve (first 10 iters): {show}')


if __name__ == '__main__':
  main()
