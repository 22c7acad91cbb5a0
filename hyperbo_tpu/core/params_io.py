"""GPParams checkpoint save/load and experiment filename encoding.

Behavioral parity with reference hyperbo/basics/params_utils.py:35-207
(pickle snapshot of GPParams.__dict__ with callables stringified, optional
(step, loss) state, config->filename encoder), with two TPU-era upgrades:

  * plain-filesystem I/O (no TF gfile dependency); any file-like scheme can
    be plugged in via `register_filesystem`.
  * host arrays are materialized with jax.device_get before pickling so a
    checkpoint never holds device buffers.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Any, Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.warp import retrieve_params

GPParams = defs.GPParams
FINAL_PARAM_FILE_INFO = 'FINAL'

# Hook for alternative filesystems (e.g. gcsfuse). Maps scheme prefix to an
# open(path, mode) callable.
_FILESYSTEMS: Dict[str, Callable[..., Any]] = {}


def register_filesystem(prefix: str, opener: Callable[..., Any]):
  _FILESYSTEMS[prefix] = opener


def _open(path: str, mode: str):
  for prefix, opener in _FILESYSTEMS.items():
    if path.startswith(prefix):
      return opener(path, mode)
  return open(path, mode)


def to_list_or_float(x):
  """Transform np.ndarray or np scalar to python list / float, if any."""
  if isinstance(x, (jnp.ndarray, np.ndarray)):
    return np.asarray(x).tolist()
  if isinstance(x, (np.float32, np.float64)):
    return float(x)
  return x


def save_to_file(filenm: str, state: Any = None):
  """Pickle `state` to `filenm`, creating parent directories."""
  if not state:
    return
  dirnm = os.path.dirname(filenm)
  if dirnm and not os.path.exists(dirnm):
    os.makedirs(dirnm, exist_ok=True)
  with _open(filenm, 'wb') as f:
    pickle.dump(state, f)


def load_from_file(filenm: str):
  if not os.path.exists(filenm):
    raise FileNotFoundError(f'{filenm} does not exist.')
  with _open(filenm, 'rb') as f:
    return pickle.load(f)


def _host_and_stringify(tree):
  """Pull arrays to host and stringify callables so the pickle is portable."""
  def fix(x):
    if callable(x):
      return str(x)
    if isinstance(x, jnp.ndarray):
      return jax.device_get(x)
    return x
  return jax.tree.map(fix, tree)


def save_params(filenm: str,
                params: Union[GPParams, Dict[str, Any]],
                state: Any = None):
  """Save GPParams (or a dict) plus optional optimizer/training state."""
  if not isinstance(params, dict):
    params = dict(params.__dict__)
  params = _host_and_stringify(params)
  if state:
    state = _host_and_stringify(state)
  save_to_file(filenm, (params, state))


def load_params(filenm: str,
                use_gpparams: bool = True,
                include_state: bool = False):
  """Load params saved by save_params."""
  params_dict, state = load_from_file(filenm)
  params = GPParams(**params_dict) if use_gpparams else params_dict
  if include_state:
    return params, state
  return params


def encode_model_filename(config):
  """Encode an experiment config (ml_collections-style) into a path factory.

  Same encoding scheme as the reference (params_utils.py:114-190) so
  checkpoints produced by experiments are discoverable by the analysis layer.
  """
  model_key = ''
  if config.data_loader_name == 'pd1':
    model_key = '-'.join(
        (config.test_dataset_index, str(config.seed), config.mean_func_name,
         config.cov_func_name, str(config.init_params.config['mlp_features']),
         config.init_params.config['objective'],
         config.init_params.config['method'],
         str(config.init_params.config['max_training_step']),
         str(config.init_params.config['batch_size']), str(config.num_remove),
         str(config.p_observed), str(config.p_remove)))
    if 'num_irrelevant' in config and config.num_irrelevant:
      model_key = '-'.join((model_key, config.num_irrelevant))
  elif 'hpob' in config.data_loader_name:
    model_key = '-'.join(
        (config.search_space_index, str(config.seed), config.mean_func_name,
         config.cov_func_name, config.init_params.config['method']))
    if isinstance(config.init_params.config['mlp_features'], tuple):
      model_key = '-'.join(
          (model_key, str(config.init_params.config['mlp_features'])))
    if config.use_surrogate_train:
      model_key = '-'.join((model_key, 'use_surrogate_train'))
    if config.wild_card_train:
      model_key = '-'.join(
          (model_key, f'wild_card_train={config.wild_card_train}'))
    if config.normalize_y:
      model_key = '-'.join((model_key, 'normalize_y'))
    if config.output_log_warp:
      model_key = '-'.join((model_key, 'output_log_warp'))
  else:
    raise NotImplementedError(
        f'Filename encoder not implemented for {config.data_loader_name}')

  def get_path(additional_info=FINAL_PARAM_FILE_INFO, model_key_only=False):
    if model_key_only:
      return model_key
    if not isinstance(config.model_dir, str):
      raise ValueError(f'config.model_dir={config.model_dir} is not valid.')
    if not isinstance(additional_info, str):
      additional_info = str(additional_info)
    if config.method == 'stbo':
      model_spec = '-'.join((model_key, config.ac_func_name, config.method,
                             config.test_dataset_index, config.test_seed))
    else:
      model_spec = model_key
    if config.data_loader_name == 'pd1':
      return os.path.join(config.model_dir, model_spec,
                          f'{additional_info}.pkl')
    elif 'hpob' in config.data_loader_name:
      return os.path.join(config.model_dir,
                          '-'.join((model_spec, additional_info)) + '.pkl')

  return get_path


def save_params_orbax(ckpt_dir: str,
                      params: Union[GPParams, Dict[str, Any]],
                      step: int = 0):
  """Checkpoint params.model with Orbax (async-safe, atomic, sharded).

  Pickle checkpoints (save_params) remain the reference-compatible
  format; Orbax is the TPU-era option for large / sharded parameter
  trees. Only `model` (the array pytree) goes through Orbax; `config`
  is stored alongside as a pickle (it holds callables).
  """
  import orbax.checkpoint as ocp
  model = params.model if not isinstance(params, dict) else params
  path = os.path.abspath(os.path.join(ckpt_dir, f'step_{step}'))
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(path, jax.device_get(model))
  ckptr.wait_until_finished()
  if not isinstance(params, dict):
    save_to_file(os.path.join(ckpt_dir, 'config.pkl'),
                 _host_and_stringify(dict(params.config)))


def load_params_orbax(ckpt_dir: str, step: int = 0,
                      template: Optional[Dict[str, Any]] = None) -> GPParams:
  """Load an Orbax checkpoint written by save_params_orbax."""
  import orbax.checkpoint as ocp
  path = os.path.abspath(os.path.join(ckpt_dir, f'step_{step}'))
  ckptr = ocp.StandardCheckpointer()
  model = ckptr.restore(path, template) if template is not None else (
      ckptr.restore(path))
  config_path = os.path.join(ckpt_dir, 'config.pkl')
  config = load_from_file(config_path) if os.path.exists(
      config_path) else {}
  return GPParams(model=model, config=config)


def log_params_loss(step: int,
                    params: GPParams,
                    loss: float,
                    warp_func: Optional[Dict[str, Callable[[Any],
                                                           Any]]] = None,
                    params_save_file: Optional[str] = None):
  """Log warped params and loss at a training step; optionally checkpoint."""
  model_params = params.model
  keys = list(model_params.keys())
  retrieved = dict(zip(keys, retrieve_params(params, keys,
                                             warp_func=warp_func)))
  logging.info('logging iter=%s, loss=%s, params.model after warping=%s',
               step, loss, retrieved)
  if params_save_file is not None:
    logging.info('Saving params to %s.', params_save_file)
    save_params(params_save_file, params, state=(step, loss))
