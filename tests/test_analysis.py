"""Analysis layer tests: regret computation, result aggregation,
percentile analysis, performance profiles, plotting smoke, and the
reference-compatible alias import surface.
"""

import os
import pickle

import numpy as np
import pytest

from hyperbo_tpu.analysis import bayesopt_results as br
from hyperbo_tpu.analysis import plots


def test_regret_sequence():
  yy = np.array([0.1, 0.5, 0.3, 0.8])
  out = br.regret_sequence(yy, maxy=1.0)
  np.testing.assert_allclose(out, [0.9, 0.5, 0.5, 0.2])


def _write_result(dirnm, yy, yq, workload='cifar10_wrn,cifar10,'
                  'wide_resnet,wrn,256'):
  os.makedirs(dirnm, exist_ok=True)
  res = {
      'observations': (np.zeros((len(yy), 2)), np.asarray(yy)[:, None]),
      'queries': (np.zeros((len(yq), 2)), np.asarray(yq)[:, None]),
      'sub_dataset_key': workload,
  }
  with open(os.path.join(dirnm, 'result.pkl'), 'wb') as f:
    pickle.dump(res, f)


def test_get_results_and_analysis(tmp_path):
  rng = np.random.RandomState(0)
  n_runs = 4
  for i in range(n_runs):
    yy = rng.uniform(0, 2, size=20)
    yq = rng.uniform(0, 2, size=10)
    _write_result(os.path.join(tmp_path, str(i + 1)), yy, yq)
  results = br.get_results(str(tmp_path), n_runs)
  assert len(results) == n_runs
  for (wl, i), (regrets, yy, maxy) in results.items():
    assert len(regrets) == 20
    assert regrets[-1] <= regrets[0] + 1e-12

  res = {'ours': results, 'baseline': results}
  w2r = br.get_workload2result(res, error_rate=False, best_only=True,
                               max_training_step=10)
  assert 'CIFAR10 WRN 256' in w2r
  analyzed = br.analyze_results(res, percentile=20, error_rate=False,
                                max_training_step=10)
  for wl, methods in analyzed.items():
    for m, stats in methods.items():
      assert len(stats) == 5  # mean, std, lower, median, upper

  # Performance profile on sequences.
  w2seq = br.get_workload2result(res, error_rate=False, best_only=False)
  refs = br.compute_workload2ref(w2seq, ['ours'], trial=20)
  fr = br.get_method2fraction(w2seq, refs, bo_iters=20)
  assert set(fr.keys()) == {'ours', 'baseline'}
  assert np.all(np.diff(fr['ours']) >= -1e-12)  # non-decreasing


def test_excluded_workload_dropped(tmp_path):
  _write_result(os.path.join(tmp_path, '1'), [0.1, 0.2], [0.3],
                workload=br.EXCLUDED_WORKLOAD)
  out = br.get_exp_result(os.path.join(tmp_path, '1'), 0, verbose=False)
  assert out is None


def test_add_regret_array():
  res = {'observations': (None, np.array([[0.1], [0.4], [0.2]])),
         'best_query': (None, 0.5)}
  out = br.process_results({'k': res}, verbose=False)
  np.testing.assert_allclose(out['k']['regret_array'], [0.4, 0.1, 0.1])


def test_decode_exp_key():
  key = ('idx-7-linear_mlp-squared_exponential_mlp-(8, 8)-nll-adam-1000-'
         '100-0-0.0-0.0-x-y-ei-hyperbo')
  acfun, num_remove, test_idx, rest = br.decode_exp_key(key, 'pd1')
  assert acfun == 'ei'
  assert num_remove == 0
  assert test_idx == 'idx'


def test_plots_smoke(tmp_path):
  import matplotlib.pyplot as plt
  rng = np.random.RandomState(1)
  label2array = {'A': rng.uniform(0.1, 1, (5, 30)),
                 'B': rng.uniform(0.1, 1, (5, 30))}
  colors = {'A': 'r', 'B': 'b'}
  fig, ax = plt.subplots()
  plots.plot_all(label2array, ax, colors=colors, method='median')
  fig = plots.plot_summary(
      ['A', 'B'], label2array, colors=colors, method='mean',
      violin_trials=[5, 20], violin_labels=['A', 'B'],
      x=list(range(1, 31)))
  fig.savefig(os.path.join(tmp_path, 'summary.png'))
  assert os.path.exists(os.path.join(tmp_path, 'summary.png'))


def test_reference_alias_imports():
  """The reference's import paths resolve to the TPU-native impls."""
  from hyperbo_tpu.basics import definitions, linalg, params_utils
  from hyperbo_tpu.basics import data_utils, lbfgs, bfgs
  from hyperbo_tpu.gp_utils import gp, kernel, mean, objectives, priors
  from hyperbo_tpu.gp_utils import utils, basis_functions
  from hyperbo_tpu.bo_utils import acfun, bayesopt, const, data
  from hyperbo_tpu.plot_utils import bayesopt_results, utils as plot_utils

  assert definitions.GPParams is not None
  assert callable(linalg.solve_gp_linear_system)
  assert callable(params_utils.retrieve_params)
  assert callable(data_utils.log_dataset)
  assert callable(lbfgs.lbfgs) and callable(bfgs.bfgs)
  assert gp.GP is not None and gp.HGP is not None
  assert callable(kernel.matern52_mlp)
  assert callable(mean.linear_mlp)
  assert callable(objectives.nll) and callable(objectives.ekl)
  assert 'noise_variance' in priors.DEFAULT_PRIORS
  assert 'lengthscale' in utils.DEFAULT_WARP_FUNC
  assert callable(basis_functions.init_mlp_with_shape)
  assert callable(acfun.ei) and callable(acfun.ucb)
  assert callable(bayesopt.run_bayesopt)
  assert 'squared_exponential' in const.KERNEL
  assert callable(data.pd1) and callable(data.random)
  assert callable(bayesopt_results.get_results)
  assert callable(plot_utils.plot_all)


def test_summarize_results_dir(tmp_path):
  """Directory-tree aggregation: regret percentiles + median curve from
  driver-format result.pkl files (analysis CLI backend)."""
  import pickle
  from hyperbo_tpu.analysis import bayesopt_results as br

  for run_id, ys in ((1, [0.1, 0.5, 0.4, 0.9]), (2, [0.2, 0.2, 0.8, 1.0])):
    d = tmp_path / str(run_id)
    d.mkdir()
    res = {
        'observations': (np.zeros((4, 2)), np.asarray(ys).reshape(-1, 1)),
        'queries': (np.zeros((4, 2)), np.asarray([[1.0]])),
        'best_query': (np.zeros(2), np.asarray([[1.0]])),
    }
    with open(d / 'result.pkl', 'wb') as f:
      pickle.dump(res, f)

  summary, runs = br.summarize_results_dir(str(tmp_path), verbose=False)
  assert summary['num_runs'] == 2
  # run 1 final regret = 1 - 0.9 = 0.1; run 2 = 0.0
  np.testing.assert_allclose(
      summary['final_regret_percentiles'][50], 0.05, atol=1e-9)
  curve = summary['median_regret_curve']
  assert len(curve) == 4 and curve[0] > curve[-1]
