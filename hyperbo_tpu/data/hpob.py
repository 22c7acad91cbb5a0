"""HPO-B benchmark loader.

The reference carries HPO-B constants (SEARCH_SPACE2TEST_DATASETS,
HPOB_ROOT_DIR at hyperbo/bo_utils/data.py:46-66) and its analysis layer
reads hpob experiment results, but ships no loader. This module loads
the public HPO-B format (json: {search_space: {dataset: {"X": [[..]],
"y": [[..]]}}}) into the framework's dataset contract:

  (dataset: Dict[str, SubDataset], sub_dataset_key, queried_sub_dataset)

with the same output-warp convention as the rest of the stack
(-log(1 + 1e-6 - y) for accuracy-like metrics, cf. data/pd1.py
get_output_warper).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyperbo_tpu.core import defs
from hyperbo_tpu.data.pd1 import get_output_warper

SubDataset = defs.SubDataset

HPOB_ROOT_DIR = 'hpob-data/'

TRAIN_FILE = 'meta-train-dataset.json'
VALIDATION_FILE = 'meta-validation-dataset.json'
TEST_FILE = 'meta-test-dataset.json'

# Search space -> test dataset ids (reference data.py:49-66).
SEARCH_SPACE2TEST_DATASETS = {
    '4796': ['3549', '3918', '9903', '23'],
    '5527': ['146064', '146065', '9914', '145804', '31', '10101'],
    '5636': ['146064', '145804', '9914', '146065', '10101', '31'],
    '5859': ['9983', '31', '37', '3902', '9977', '125923'],
    '5860': ['14965', '9976', '3493'],
    '5889': ['9971', '3918'],
    '5891': ['9889', '3899', '6566', '9980', '3891', '3492'],
    '5906': ['9971', '3918'],
    '5965': ['145836', '9914', '3903', '10101', '9889', '49', '9946'],
    '5970': ['37', '3492', '9952', '49', '34536', '14951'],
    '5971': ['10093', '3954', '43', '34536', '9970', '6566'],
    '6766': ['3903', '146064', '145953', '145804', '31', '10101'],
    '6767': ['146065', '145804', '146064', '9914', '9967', '31'],
    '6794': ['145804', '3', '146065', '10101', '9914', '31'],
    '7607': ['14965', '145976', '3896', '3913', '3903', '9946', '9967'],
    '7609': ['145854', '3903', '9967', '145853', '34537', '125923',
             '145878'],
}


def _load_split(root_dir: str, filename: str, search_space: str):
  path = os.path.join(root_dir, filename)
  if not os.path.exists(path):
    return {}
  with open(path) as f:
    data = json.load(f)
  return data.get(search_space, {})


def _to_sub_dataset(entry, warper, normalize_y: bool) -> SubDataset:
  x = jnp.asarray(np.asarray(entry['X'], np.float32))
  y = np.asarray(entry['y'], np.float32).reshape(-1, 1)
  if normalize_y:
    y = (y - y.min()) / max(y.max() - y.min(), 1e-12)
  y = warper(y)
  return SubDataset(x=x, y=jnp.asarray(np.asarray(y, np.float32)))


def hpob(key,
         search_space_index: str,
         test_dataset_index: Optional[str] = None,
         root_dir: str = HPOB_ROOT_DIR,
         p_observed: float = 0.,
         normalize_y: bool = False,
         output_log_warp: bool = True,
         use_validation: bool = False,
         verbose: bool = True):
  """Load one HPO-B search space.

  Returns (dataset, sub_dataset_key, queried_sub_dataset): meta-train
  (+ optional validation) datasets for pre-training, and the chosen
  meta-test dataset as the queryable test task (a p_observed fraction of
  it is moved into the training dataset under the test key).
  """
  train = _load_split(root_dir, TRAIN_FILE, search_space_index)
  if use_validation:
    train.update(_load_split(root_dir, VALIDATION_FILE,
                             search_space_index))
  test = _load_split(root_dir, TEST_FILE, search_space_index)
  if not train and not test:
    raise FileNotFoundError(
        f'No HPO-B data for search space {search_space_index} under '
        f'{root_dir} (expected {TRAIN_FILE} / {TEST_FILE}).')

  warper = get_output_warper(output_log_warp=output_log_warp)

  dataset: Dict[str, SubDataset] = {}
  for dataset_id, entry in train.items():
    dataset[dataset_id] = _to_sub_dataset(entry, warper, normalize_y)

  if test_dataset_index is None:
    candidates = SEARCH_SPACE2TEST_DATASETS.get(search_space_index,
                                                sorted(test))
    candidates = [c for c in candidates if c in test] or sorted(test)
    idx = int(jax.random.choice(key, len(candidates)))
    test_dataset_index = candidates[idx]
  if test_dataset_index not in test:
    raise ValueError(
        f'test dataset {test_dataset_index} not in meta-test split '
        f'{sorted(test)}')
  queried = _to_sub_dataset(test[test_dataset_index], warper, normalize_y)

  if p_observed > 0:
    n = queried.x.shape[0]
    key, subkey = jax.random.split(key)
    perm = jax.random.permutation(subkey, n)
    n_obs = int(np.floor(p_observed * n))
    obs_idx, query_idx = perm[:n_obs], perm[n_obs:]
    dataset[test_dataset_index] = SubDataset(
        x=queried.x[obs_idx], y=queried.y[obs_idx])
    queried = SubDataset(x=queried.x[query_idx], y=queried.y[query_idx])

  msg = (f'hpob search space {search_space_index}: '
         f'{len(dataset)} train datasets, test={test_dataset_index}, '
         f'queries={queried.x.shape}')
  logging.info(msg)
  if verbose:
    print(msg)
  return dataset, test_dataset_index, queried
