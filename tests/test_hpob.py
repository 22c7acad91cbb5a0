"""HPO-B loader tests on a synthetic fixture tree."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbo_tpu.data import hpob


@pytest.fixture
def hpob_root(tmp_path):
  rng = np.random.RandomState(0)
  def entry(n, d=3):
    return {'X': rng.uniform(0, 1, (n, d)).tolist(),
            'y': rng.uniform(0, 1, (n, 1)).tolist()}
  train = {'5860': {'taskA': entry(20), 'taskB': entry(15)}}
  test = {'5860': {'14965': entry(30), '9976': entry(25)}}
  with open(tmp_path / hpob.TRAIN_FILE, 'w') as f:
    json.dump(train, f)
  with open(tmp_path / hpob.TEST_FILE, 'w') as f:
    json.dump(test, f)
  return str(tmp_path)


def test_hpob_loads(hpob_root):
  dataset, sdk, queried = hpob.hpob(
      jax.random.PRNGKey(0), '5860', root_dir=hpob_root, verbose=False)
  assert set(dataset) == {'taskA', 'taskB'}
  assert sdk in ('14965', '9976')  # from SEARCH_SPACE2TEST_DATASETS
  assert queried.x.shape[1] == 3
  # output log warp applied: y = -log(1+1e-6-acc) > 0 for acc in (0,1)
  assert np.all(np.asarray(queried.y) > 0)


def test_hpob_p_observed_split(hpob_root):
  dataset, sdk, queried = hpob.hpob(
      jax.random.PRNGKey(1), '5860', test_dataset_index='14965',
      root_dir=hpob_root, p_observed=0.4, verbose=False)
  assert sdk == '14965'
  assert dataset['14965'].x.shape[0] == 12  # floor(0.4*30)
  assert queried.x.shape[0] == 18


def test_hpob_missing_dir():
  with pytest.raises(FileNotFoundError):
    hpob.hpob(jax.random.PRNGKey(0), '5860', root_dir='/nonexistent',
              verbose=False)


def test_hpob_normalize_y(hpob_root):
  dataset, _, queried = hpob.hpob(
      jax.random.PRNGKey(2), '5860', root_dir=hpob_root,
      normalize_y=True, output_log_warp=False, verbose=False)
  for v in dataset.values():
    assert float(jnp.min(v.y)) >= 0 and float(jnp.max(v.y)) <= 1
