"""End-to-end PD1-format path on the checked-in miniature fixture:
fastjsonl scan -> dataframe pipeline (warps, aligned pivot, held-out
task) -> GP pre-training -> simulated BO -> analysis regrets.

Covers the real-data loader semantics (reference
hyperbo/bo_utils/data.py:356-443) that the synthetic 'random' loader
cannot: jsonl parsing, input/output warps, matched-phase alignment with
per-workload holes.
"""

import os

import jax
import numpy as np
import pytest

from hyperbo_tpu.analysis import bayesopt_results as br
from hyperbo_tpu.bo import const
from hyperbo_tpu.data import pd1 as pd1_data
from hyperbo_tpu.experiments import driver

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), 'fixtures',
                           'pd1_mini')
DATA_FILES = {
    (phase, matched): os.path.join(
        FIXTURE_DIR, f'pd1_{matched}_{phase}_results.jsonl')
    for phase in ('phase0', 'phase1') for matched in ('matched',
                                                      'unmatched')
}


def test_fastjsonl_parses_fixture():
  """The native scanner handles the fixture (no pandas fallback)."""
  from hyperbo_tpu.native import jsonl as native_jsonl
  labels = pd1_data.PD1_LABELS + ['best_valid/error_rate']
  path = DATA_FILES[('phase0', 'matched')]
  with open(path) as f:
    n_lines = sum(1 for _ in f)
  cols = [c.replace('/', '\\/') for c in labels]
  parsed = native_jsonl.parse_jsonl(path, cols, 'study_group')
  if parsed is None:
    pytest.skip('native scanner unavailable in this environment')
  values, groups = parsed
  assert values.shape == (n_lines, 5)
  assert not np.any(np.isnan(values))
  assert len(groups) == n_lines
  assert groups[0].startswith('mini_cifar')


def test_pd1_loader_on_fixture():
  dataset, sdk, queried = pd1_data.pd1(
      jax.random.PRNGKey(0), p_observed=0.3, verbose=False,
      data_files=dict(DATA_FILES))
  # 4 workloads, one held out as the test task.
  unaligned = {k: v for k, v in dataset.items() if v.aligned is None}
  aligned = {k: v for k, v in dataset.items() if v.aligned is not None}
  assert sdk.startswith('mini_')
  assert aligned, 'matched phases must produce aligned sub-datasets'
  for v in dataset.values():
    assert v.x.shape[1] == 4
  assert queried.x.shape[1] == 4 and queried.y.shape[1] == 1
  # output warp: error rate e in (0,1) -> -log(e + 1e-10) > 0
  assert float(np.min(np.asarray(queried.y))) > 0
  # input warps applied: momentum -> log(1-m) < 0, lr -> log(lr) < 0 mostly
  xs = np.concatenate([np.asarray(v.x) for v in unaligned.values()])
  assert float(np.max(xs[:, 3])) < 0  # log(1 - momentum)
  # aligned holes: the drop-one-group combinations appear
  assert any(';' in k and k.count(';') >= 1 for k in aligned)


def test_pd1_fixture_pretrain_bo_analysis_roundtrip(tmp_path):
  for run_id in (1, 2):
    init = driver.default_init_params(const.HBO)
    init.config['max_training_step'] = 15
    init.config['retrain'] = 0
    result = driver.run_experiment(
        data_loader_name='pd1', method=const.HBO,
        ac_func_name='expected_improvement', iters=4, seed=run_id,
        output_dir=str(tmp_path), run_id=run_id, init_params=init,
        mean_func_name='constant', cov_func_name='matern52',
        dataset_kwargs=dict(p_observed=0.3,
                            data_files=dict(DATA_FILES)),
        verbose=False)
    x_obs, y_obs = result['observations']
    # p_observed=0.3 seeds the run with 30% of the held-out workload's
    # rows; the 4 BO iterations append on top.
    assert x_obs.shape[0] >= 4 and x_obs.shape[1] == 4
    assert os.path.exists(os.path.join(tmp_path, str(run_id),
                                       'result.pkl'))
  results = br.get_results(str(tmp_path), 2)
  assert len(results) == 2
  for (_, i), (regrets, yy, maxy) in results.items():
    assert len(regrets) >= 4
    assert regrets[-1] >= 0
    assert maxy >= yy.max() - 1e-6
