"""Native C++ JSONL scanner tests: build, parse correctness vs pandas,
fallback behavior, and integration through the PD1 loader.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from hyperbo_tpu.native import jsonl as native_jsonl


@pytest.fixture
def toy_jsonl(tmp_path):
  rows = []
  rng = np.random.RandomState(0)
  for i in range(50):
    rows.append({
        'study_group': f'g{i % 3}',
        'hps.lr_hparams.initial_value': float(rng.uniform(1e-4, 1)),
        'hps.opt_hparams.momentum': float(rng.uniform(0, 1)),
        'best_valid/error_rate': float(rng.uniform(0, 1)),
        'extra_column': 'ignored',
        'intval': i,
    })
  # One row with a null metric and one missing the string key.
  rows.append({'study_group': 'g0',
               'hps.lr_hparams.initial_value': 0.5,
               'hps.opt_hparams.momentum': 0.5,
               'best_valid/error_rate': None, 'intval': -1})
  rows.append({'hps.lr_hparams.initial_value': 0.5,
               'hps.opt_hparams.momentum': 0.5,
               'best_valid/error_rate': 0.5, 'intval': -2})
  path = tmp_path / 'toy.jsonl'
  with open(path, 'w') as f:
    for r in rows:
      f.write(json.dumps(r) + '\n')
  return str(path)


def test_native_build_and_parse(toy_jsonl):
  if not native_jsonl.available():
    pytest.skip('native toolchain unavailable')
  keys = ['hps.lr_hparams.initial_value', 'hps.opt_hparams.momentum',
          'best_valid/error_rate']
  values, groups = native_jsonl.parse_jsonl(toy_jsonl, keys,
                                            'study_group')
  # 51 rows have study_group (one row lacks it and is skipped).
  assert values.shape == (51, 3)
  assert len(groups) == 51
  # Cross-check against pandas on the common rows.
  df = pd.read_json(toy_jsonl, orient='records', lines=True)
  df = df[df['study_group'].notna()]
  np.testing.assert_allclose(
      values[:, 0], df['hps.lr_hparams.initial_value'].to_numpy(),
      rtol=1e-12)
  np.testing.assert_allclose(
      values[:, 1], df['hps.opt_hparams.momentum'].to_numpy(), rtol=1e-12)
  # Null metric -> NaN.
  got_metric = values[:, 2]
  want_metric = df['best_valid/error_rate'].to_numpy(dtype=float)
  np.testing.assert_allclose(got_metric, want_metric, rtol=1e-12)
  assert np.isnan(got_metric[-1])
  assert groups == list(df['study_group'])


def test_parse_missing_file_returns_none():
  if not native_jsonl.available():
    pytest.skip('native toolchain unavailable')
  assert native_jsonl.parse_jsonl('/nonexistent/x.jsonl', ['a'], 's') is None


def test_pd1_loader_uses_native_and_matches_pandas(tmp_path):
  """PD1 loader result is identical whether the scanner or pandas reads
  the file."""
  import jax
  from hyperbo_tpu.data import pd1 as pd1_data
  rng = np.random.RandomState(1)
  rows = []
  for sg in ['w1,cifar,m,a,64', 'w2,mnist,m,a,64']:
    for _ in range(15):
      rows.append({
          'study_group': sg,
          'hps.lr_hparams.decay_steps_factor': float(rng.uniform(.1, .9)),
          'hps.lr_hparams.initial_value': float(rng.uniform(1e-4, 1.)),
          'hps.lr_hparams.power': float(rng.uniform(.1, 2.)),
          'hps.opt_hparams.momentum': float(rng.uniform(.1, .99)),
          'best_valid/error_rate': float(rng.uniform(.05, .9)),
      })
  path = tmp_path / 'pd1.jsonl'
  with open(path, 'w') as f:
    for r in rows:
      f.write(json.dumps(r) + '\n')
  files = {('phase0', 'unmatched'): str(path)}

  ds_native, sdk_n, q_n = pd1_data.pd1(
      jax.random.PRNGKey(0), p_observed=0.5, verbose=False,
      data_files=files)
  # Force the pandas path by monkeypatching availability.
  import hyperbo_tpu.native.jsonl as nj
  orig = nj.parse_jsonl
  nj.parse_jsonl = lambda *a, **k: None
  try:
    ds_pandas, sdk_p, q_p = pd1_data.pd1(
        jax.random.PRNGKey(0), p_observed=0.5, verbose=False,
        data_files=files)
  finally:
    nj.parse_jsonl = orig
  assert sdk_n == sdk_p
  np.testing.assert_allclose(np.asarray(q_n.x), np.asarray(q_p.x),
                             rtol=1e-6)
  assert set(ds_native.keys()) == set(ds_pandas.keys())
  for k in ds_native:
    np.testing.assert_allclose(np.asarray(ds_native[k].x),
                               np.asarray(ds_pandas[k].x), rtol=1e-6)
