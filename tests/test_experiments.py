"""Experiment driver tests: every method runs end-to-end on synthetic
data and the result files round-trip through the analysis layer.
"""

import os

import numpy as np
import pytest

from hyperbo_tpu.analysis import bayesopt_results as br
from hyperbo_tpu.bo import const
from hyperbo_tpu.experiments import driver


@pytest.mark.parametrize('method,mean_fn,cov_fn', [
    (const.RAND, 'constant', 'matern52'),
    (const.STBO, 'constant', 'matern52'),
    (const.MTBO, 'constant', 'matern52'),
    (const.HBO, 'linear_mlp', 'squared_exponential_mlp'),
])
def test_driver_methods(method, mean_fn, cov_fn, tmp_path):
  init = driver.default_init_params(method)
  init.config['max_training_step'] = min(
      init.config['max_training_step'], 20)
  init.config['retrain'] = min(init.config.get('retrain', 0), 5)
  result = driver.run_experiment(
      data_loader_name='random', method=method,
      ac_func_name='expected_improvement', iters=4, seed=0,
      output_dir=str(tmp_path), run_id=1, init_params=init,
      mean_func_name=mean_fn, cov_func_name=cov_fn,
      dataset_kwargs=dict(n_queries=25, n_func_historical=3,
                          m_points_historical=10),
      verbose=False)
  x_obs, y_obs = result['observations']
  assert y_obs.shape[0] >= 4
  assert os.path.exists(os.path.join(tmp_path, '1', 'result.pkl'))


def test_driver_to_analysis_roundtrip(tmp_path):
  for run_id in (1, 2):
    init = driver.default_init_params(const.RAND)
    driver.run_experiment(
        data_loader_name='random', method=const.RAND,
        ac_func_name='expected_improvement', iters=6, seed=run_id,
        output_dir=str(tmp_path), run_id=run_id, init_params=init,
        mean_func_name='constant', cov_func_name='matern52',
        dataset_kwargs=dict(n_queries=25, n_func_historical=2,
                            m_points_historical=8),
        verbose=False)
  results = br.get_results(str(tmp_path), 2)
  assert len(results) == 2
  for (_, i), (regrets, yy, maxy) in results.items():
    assert len(regrets) == 6
    assert regrets[-1] >= 0
    # regret reaches 0 iff the best query was found
    assert maxy >= yy.max() - 1e-6


def test_config_system_and_filename_encoder(tmp_path):
  """ConfigDict round trip: run_from_config + encode_model_filename."""
  from hyperbo_tpu.core import params_io
  from hyperbo_tpu.experiments import configs

  config = configs.get_config('pd1')
  config.model_dir = str(tmp_path)
  config.test_dataset_index = 'wl'
  get_path = params_io.encode_model_filename(config)
  path = get_path()
  assert path.startswith(str(tmp_path)) and path.endswith('FINAL.pkl')
  assert 'linear_mlp' in path and 'adam' in path

  # random-loader end-to-end through the config path
  config = configs.get_config('random')
  config.iters = 3
  config.method = const.RAND
  config.mean_func_name = 'constant'
  config.cov_func_name = 'matern52'
  config.init_params.config['max_training_step'] = 5
  config.output_dir = str(tmp_path / 'out')
  result = configs.run_from_config(config)
  assert result['observations'][1].shape[0] >= 3
  assert os.path.exists(os.path.join(config.output_dir, '1',
                                     'result.pkl'))


def test_driver_ondevice_path(tmp_path):
  """--ondevice runs the BO loop as one on-device scan (GP method)."""
  init = driver.default_init_params(const.HBO)
  init.config['max_training_step'] = 10
  result = driver.run_experiment(
      data_loader_name='random', method=const.HBO,
      ac_func_name='expected_improvement', iters=4, seed=0,
      output_dir=str(tmp_path), run_id=3, init_params=init,
      mean_func_name='linear_mlp',
      cov_func_name='squared_exponential_mlp',
      ondevice=True,
      dataset_kwargs=dict(n_queries=25, n_func_historical=3,
                          m_points_historical=10),
      verbose=False)
  x_obs, y_obs = result['observations']
  assert y_obs.shape[0] == 4 and x_obs.shape[1] == 2
  assert np.all(np.isfinite(np.asarray(y_obs)))
  assert result['best_query'] is not None


def test_driver_ondevice_retrain_path(tmp_path):
  """--ondevice + config['retrain']>0 (the STBO regime) routes to the
  in-scan retraining loop instead of raising."""
  init = driver.default_init_params(const.STBO)
  init.config['retrain'] = 5  # keep the CPU test cheap
  result = driver.run_experiment(
      data_loader_name='random', method=const.STBO,
      ac_func_name='expected_improvement', iters=3, seed=1,
      output_dir=str(tmp_path), run_id=4, init_params=init,
      mean_func_name='constant',
      cov_func_name='squared_exponential',
      ondevice=True,
      dataset_kwargs=dict(n_queries=20, n_func_historical=2,
                          m_points_historical=8),
      verbose=False)
  x_obs, y_obs = result['observations']
  assert y_obs.shape[0] == 3
  assert np.all(np.isfinite(np.asarray(y_obs)))
