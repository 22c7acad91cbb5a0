"""Experiment configuration (ml_collections ConfigDict).

The reference's experiment-level config is an ml_collections.ConfigDict
consumed by the checkpoint filename encoder
(hyperbo/basics/params_utils.py:114-190). This module provides the
canonical config factory for hyperbo_tpu experiments plus the glue to
run the driver from a config and derive checkpoint paths with
encode_model_filename.
"""

from __future__ import annotations

import ml_collections

from hyperbo_tpu.core import defs


def get_config(data_loader_name: str = 'pd1') -> ml_collections.ConfigDict:
  """Default experiment config (pd1 / hpob / random)."""
  config = ml_collections.ConfigDict()
  config.data_loader_name = data_loader_name
  config.seed = 0
  config.test_seed = '0'
  config.mean_func_name = 'linear_mlp'
  config.cov_func_name = 'squared_exponential_mlp'
  config.ac_func_name = 'expected_improvement'
  config.method = 'hyperbo'
  config.iters = 100
  config.output_dir = ''
  config.model_dir = ''
  config.run_id = 1

  # Dataset knobs.
  config.test_dataset_index = ''
  config.search_space_index = ''
  config.num_remove = 0
  config.p_observed = 0.0
  config.p_remove = 0.0
  config.num_irrelevant = ''
  config.use_surrogate_train = False
  config.wild_card_train = False
  config.normalize_y = False
  config.output_log_warp = True

  init = defs.GPParams(
      model={'constant': 0., 'lengthscale': 0., 'signal_variance': 0.,
             'noise_variance': -4.},
      config={'method': 'adam', 'learning_rate': 1e-2,
              'max_training_step': 1000, 'batch_size': 100,
              'objective': 'nll', 'mlp_features': (8, 8),
              'retrain': 0, 'tol': 1e-6})
  config.init_params = init
  return config


def run_from_config(config: ml_collections.ConfigDict):
  """Run one experiment described by `config` through the driver."""
  from hyperbo_tpu.core import params_io
  from hyperbo_tpu.experiments import driver

  get_params_path = None
  if config.model_dir:
    get_params_path = params_io.encode_model_filename(config)

  dataset_kwargs = {}
  if config.data_loader_name == 'pd1':
    dataset_kwargs = dict(
        p_observed=config.p_observed, num_remove=config.num_remove,
        p_remove=config.p_remove,
        sub_dataset_key=config.test_dataset_index or None)
  elif config.data_loader_name == 'hpob':
    dataset_kwargs = dict(
        search_space_index=config.search_space_index,
        test_dataset_index=config.test_dataset_index or None,
        normalize_y=config.normalize_y,
        output_log_warp=config.output_log_warp)

  result = driver.run_experiment(
      data_loader_name=config.data_loader_name,
      method=config.method,
      ac_func_name=config.ac_func_name,
      iters=config.iters,
      seed=config.seed,
      output_dir=config.output_dir or None,
      run_id=config.run_id,
      init_params=config.init_params,
      mean_func_name=config.mean_func_name,
      cov_func_name=config.cov_func_name,
      dataset_kwargs=dataset_kwargs)
  if get_params_path is not None:
    params_io.save_params(get_params_path(), {
        'params_dict': result['params_dict'],
        'sub_dataset_key': result['sub_dataset_key'],
    })
  return result
