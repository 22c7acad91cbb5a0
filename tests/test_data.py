"""Data layer tests: synthetic generator shapes, dataframe pipeline with
aligned pivoting, deduplication, MAF normalization, params I/O roundtrip.

Mirrors reference hyperbo/bo_utils/data_test.py:45-147 plus the
dataframe-processing path on a handcrafted fixture.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from hyperbo_tpu.core import defs
from hyperbo_tpu.core import params_io
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
from hyperbo_tpu.data import frames
from hyperbo_tpu.data import pd1 as pd1_data
from hyperbo_tpu.data import synthetic
from hyperbo_tpu.models import kernel
from hyperbo_tpu.models import mean

GPParams = defs.GPParams
WF = DEFAULT_WARP_FUNC


def test_synthetic_random_shapes():
  params = GPParams(model={
      'constant': 1., 'lengthscale': jnp.array([.5, .5, .5]),
      'signal_variance': 1.0, 'noise_variance': 0.01})
  dataset, sdk, queried = synthetic.random(
      jax.random.PRNGKey(0), mean.constant, kernel.squared_exponential,
      params, dim=3, n_observed=5, n_queries=9, n_func_historical=4,
      m_points_historical=7, warp_func=WF)
  assert sdk == 4
  assert len(dataset) == 5
  for i in range(4):
    assert dataset[i].x.shape == (7, 3)
    assert dataset[i].y.shape == (7, 1)
  assert dataset[4].x.shape == (5, 3)
  assert queried.x.shape == (9, 3)
  assert queried.y.shape == (9, 1)


def _toy_trials():
  """3 study groups; group c matched on a shared grid; b has a hole."""
  rows = []
  grid = [(0.1, 0.2), (0.3, 0.4), (0.5, 0.6), (0.7, 0.8)]
  for sg, offset in [('s1,taskA', 0.0), ('s2,taskB', 1.0),
                     ('s3,taskC', 2.0)]:
    for i, (h1, h2) in enumerate(grid):
      if sg == 's2,taskB' and i == 3:
        continue  # hole: s2 missing the 4th matched point
      rows.append(dict(study_group=sg, h1=h1, h2=h2,
                       metric=offset + h1 + h2, aligned=True,
                       aligned_suffix='phase0'))
    # some unmatched rows per group
    for j in range(5):
      rows.append(dict(study_group=sg, h1=0.01 * j + offset,
                       h2=0.02 * j, metric=offset - j, aligned=False,
                       aligned_suffix='phase0'))
  return pd.DataFrame(rows)


def test_process_dataframe_pipeline():
  trials = _toy_trials()
  labels = ['h1', 'h2', 'metric']
  dataset, sdk, queried = frames.process_dataframe(
      key=jax.random.PRNGKey(0), trials=trials,
      study_identifier='study_group', labels=labels, p_observed=0.,
      maximize_metric=True, verbose=False)
  # test task fully held out
  assert sdk not in dataset or dataset[sdk].x.shape[0] < 9
  assert queried.x.shape[1] == 2
  # aligned sub-datasets present: full intersection (3 rows over all
  # remaining groups when s2 has the hole) and the drop-s2 combination.
  aligned = {k: v for k, v in dataset.items() if v.aligned is not None}
  assert aligned, 'no aligned sub-datasets built'
  for v in aligned.values():
    assert v.y.shape[1] >= 1
    assert v.x.shape[0] == v.y.shape[0]


def _pivot_oracle(trials, study_identifier, labels):
  """Reference-spec aligned pivot (pandas), used only as a test oracle
  for the vectorized observation-mask implementation."""
  import itertools
  out = {}
  trials = trials[trials['aligned']]
  for suffix in trials['aligned_suffix'].unique():
    at = trials[trials['aligned_suffix'] == suffix]
    aligned_groups = list(at[study_identifier].unique())
    pv = at.pivot(index=labels[:-1], columns=study_identifier,
                  values=labels[-1])
    nan_groups = [c for c in pv.columns if pv[c].isna().values.any()]
    combnum = min(3, len(nan_groups) + 1, len(aligned_groups) - 1)
    for groups in itertools.chain(
        *[itertools.combinations(nan_groups, r) for r in range(combnum)]):
      remain = [g for g in aligned_groups if g not in groups]
      if groups:
        idx = np.all([pv[g].isnull() for g in groups], axis=0)
        sub = pv.loc[idx, remain].dropna().reset_index()
      else:
        sub = pv.dropna().reset_index()
      if sub.shape[0] > 0:
        k = ';'.join(list(groups) + [suffix])
        out[k] = (sub[labels[:-1]].to_numpy(), sub[remain].to_numpy(),
                  ';'.join(remain + [suffix]))
  return out


def test_aligned_dataset_matches_pivot_oracle():
  """Vectorized observation-mask build == reference pandas-pivot spec,
  on randomized fixtures with per-group holes (incl. 2-group drops)."""
  rng = np.random.RandomState(0)
  for trial in range(4):
    rows = []
    grid = rng.uniform(size=(8, 2))
    groups = [f'g{i},task{i}' for i in range(4)]
    for gi, sg in enumerate(groups):
      for ri, (h1, h2) in enumerate(grid):
        # random holes (group 0 complete so len(groups)-1 bound differs
        # from the nan-group count)
        if gi > 0 and rng.uniform() < 0.3:
          continue
        rows.append(dict(study_group=sg, h1=h1, h2=h2,
                         metric=float(rng.normal() + gi),
                         aligned=True,
                         aligned_suffix=f'ph{ri % 2}'))
    trials = pd.DataFrame(rows)
    labels = ['h1', 'h2', 'metric']
    got = frames.get_aligned_dataset(trials, 'study_group', labels,
                                     verbose=False)
    want = _pivot_oracle(trials, 'study_group', labels)
    assert set(got.keys()) == set(want.keys()), (trial, got.keys(),
                                                 want.keys())
    for k, sub in got.items():
      wx, wy, wtag = want[k]
      np.testing.assert_allclose(np.asarray(sub.x), wx, err_msg=k)
      np.testing.assert_allclose(np.asarray(sub.y), wy, err_msg=k)
      assert sub.aligned == wtag, (k, sub.aligned, wtag)


def test_aligned_dataset_rejects_duplicate_evaluations():
  rows = [dict(study_group='g0', h1=0.1, h2=0.2, metric=1.0,
               aligned=True, aligned_suffix='ph0'),
          dict(study_group='g0', h1=0.1, h2=0.2, metric=2.0,
               aligned=True, aligned_suffix='ph0'),
          dict(study_group='g1', h1=0.1, h2=0.2, metric=3.0,
               aligned=True, aligned_suffix='ph0')]
  with pytest.raises(ValueError):
    frames.get_aligned_dataset(pd.DataFrame(rows), 'study_group',
                               ['h1', 'h2', 'metric'], verbose=False)


def test_process_dataframe_negates_metric_when_minimizing():
  trials = _toy_trials()
  labels = ['h1', 'h2', 'metric']
  ds_max, _, q_max = frames.process_dataframe(
      key=jax.random.PRNGKey(0), trials=trials.copy(),
      study_identifier='study_group', labels=labels,
      maximize_metric=True, verbose=False)
  ds_min, _, q_min = frames.process_dataframe(
      key=jax.random.PRNGKey(0), trials=trials.copy(),
      study_identifier='study_group', labels=labels,
      maximize_metric=False, verbose=False)
  np.testing.assert_allclose(np.asarray(q_min.y), -np.asarray(q_max.y))


def test_num_remove_reduces_tasks():
  trials = _toy_trials()
  labels = ['h1', 'h2', 'metric']
  ds0, _, _ = frames.process_dataframe(
      key=jax.random.PRNGKey(1), trials=trials.copy(),
      study_identifier='study_group', labels=labels, verbose=False)
  ds1, _, _ = frames.process_dataframe(
      key=jax.random.PRNGKey(1), trials=trials.copy(),
      study_identifier='study_group', labels=labels, num_remove=1,
      verbose=False)
  unaligned0 = [k for k, v in ds0.items() if v.aligned is None]
  unaligned1 = [k for k, v in ds1.items() if v.aligned is None]
  assert len(unaligned1) < len(unaligned0)


def test_deduplicate_keeps_best_y():
  x = np.array([[0., 0.], [1., 1.], [0., 0.], [2., 2.]])
  y = np.array([[1.], [5.], [3.], [2.]])
  xd, yd = pd1_data._deduplicate(x, y, 'toy', verbose=False)
  assert xd.shape == (3, 2)
  idx = {tuple(r): v[0] for r, v in zip(xd, yd)}
  assert idx[(0., 0.)] == 3.  # kept the duplicate with the best y


def test_normalize_maf_dataset():
  maf = {'a': dict(X=np.array([[0., 10.], [1., 20.]]),
                   Y=np.array([[-0.3], [-0.7]])),
         'b': dict(X=np.array([[0.5, 15.]]), Y=np.array([[-0.5]]))}
  out = pd1_data._normalize_maf_dataset(maf, 2, neg_error_to_accuracy=True)
  all_x = np.concatenate([out['a']['X'], out['b']['X']])
  assert all_x.min() >= 0 and all_x.max() <= 1
  np.testing.assert_allclose(out['b']['Y'], 0.5)


def test_output_warper():
  warper = pd1_data.get_output_warper(output_log_warp=True)
  y = np.array([0.3, 0.9])
  out = warper(y)
  np.testing.assert_allclose(out, -np.log(1 + 1e-6 - y), rtol=1e-6)
  with pytest.raises(ValueError):
    warper(np.array([1.5]))
  ident = pd1_data.get_output_warper(output_log_warp=False)
  np.testing.assert_allclose(ident(y), y)


def test_pd1_loader_from_jsonl(tmp_path):
  """End-to-end PD1 loader on a synthetic jsonl fixture."""
  rng = np.random.RandomState(0)
  rows = []
  for sg in ['w1,cifar10,m,a,64', 'w2,mnist,m,a,64']:
    for i in range(12):
      rows.append(dict(
          study_group=sg,
          **{'hps.lr_hparams.decay_steps_factor': rng.uniform(.1, .9),
             'hps.lr_hparams.initial_value': rng.uniform(1e-4, 1.),
             'hps.lr_hparams.power': rng.uniform(.1, 2.),
             'hps.opt_hparams.momentum': rng.uniform(.1, .99),
             'best_valid/error_rate': rng.uniform(.05, .9)}))
  df = pd.DataFrame(rows)
  path = tmp_path / 'toy.jsonl'
  df.to_json(path, orient='records', lines=True)
  files = {('phase0', 'unmatched'): str(path)}
  dataset, sdk, queried = pd1_data.pd1(
      jax.random.PRNGKey(0), p_observed=0.3, verbose=False,
      data_files=files)
  assert queried.x.shape[1] == 4
  # input warp applied: momentum column is log(1-x) < 0
  for v in dataset.values():
    if v.aligned is None and v.x.shape[0]:
      assert np.all(np.asarray(v.x[:, 3]) < 0)


def test_params_io_roundtrip(tmp_path):
  params = GPParams(
      model={'constant': 1.5, 'lengthscale': jnp.array([.3, .4])},
      config={'method': 'adam', 'objective': 'nll'})
  path = os.path.join(tmp_path, 'sub', 'params.pkl')
  params_io.save_params(path, params, state=(7, 0.25))
  loaded, state = params_io.load_params(path, include_state=True)
  assert state == (7, 0.25)
  np.testing.assert_allclose(loaded.model['lengthscale'],
                             params.model['lengthscale'])
  assert loaded.config['method'] == 'adam'


def test_params_io_orbax_roundtrip(tmp_path):
  params = GPParams(
      model={'constant': jnp.asarray(1.5),
             'lengthscale': jnp.array([.3, .4]),
             'mlp': {'w': jnp.ones((2, 3))}},
      config={'method': 'adam', 'objective': 'nll'})
  params_io.save_params_orbax(str(tmp_path), params, step=5)
  loaded = params_io.load_params_orbax(str(tmp_path), step=5)
  np.testing.assert_allclose(loaded.model['lengthscale'],
                             params.model['lengthscale'])
  np.testing.assert_allclose(loaded.model['mlp']['w'],
                             params.model['mlp']['w'])
  assert loaded.config['method'] == 'adam'


def test_grid2020_loader_from_directories(tmp_path):
  """grid2020 on an init2winit-style directory tree (ref data.py:649-715)."""
  rng = np.random.RandomState(1)
  # A shared hyperparameter grid (same configs in both studies) so the
  # aligned matched-trial pivot has content.
  grid = [dict(momentum=rng.uniform(.1, .99),
               initial_learning_rate=rng.uniform(1e-4, 1.),
               power=rng.uniform(.1, 2.),
               decay_steps_factor=rng.uniform(.1, .9)) for _ in range(8)]
  import json
  for ds in ['cifar10', 'mnist']:
    exp = tmp_path / f'grid_{ds}'
    for i, cfg in enumerate(grid):
      trial = exp / f'trial_{i}'
      trial.mkdir(parents=True)
      (trial / 'hparams.json').write_text(json.dumps({
          'dataset': ds,
          'opt_hparams': {'momentum': cfg['momentum']},
          'lr_hparams': {k: cfg[k] for k in
                         ('initial_learning_rate', 'power',
                          'decay_steps_factor')}}))
      curve = rng.uniform(.05, .9, size=5)
      pd.DataFrame({'valid/ce_loss': rng.uniform(.1, 3., size=5),
                    'valid/error_rate': curve}).to_csv(
                        trial / 'measurements.csv', index=False)
  dirs = [str(tmp_path / 'grid_cifar10'), str(tmp_path / 'grid_mnist')]

  dataset, sdk, queried = pd1_data.grid2020(
      jax.random.PRNGKey(0), p_observed=0.5, verbose=False, data_dirs=dirs)
  assert queried.x.shape[1] == 4
  assert sdk in dataset
  # Input warp applied: momentum column (label 0) is log(1-x) < 0; output
  # warp -log(err + 1e-10) > 0 for err < 1.
  assert np.all(np.asarray(queried.x[:, 0]) < 0)
  assert np.all(np.asarray(queried.y) > 0)
  # aligned=True rows produce matched-trial aligned sub-datasets.
  assert any(v.aligned is not None for v in dataset.values())

  # Pre-loaded experiment_df path agrees with the directory scan.
  df = pd1_data.load_grid2020_directories(dirs)
  assert df.shape[0] == 16
  best = pd1_data.add_best_eval_columns(df.copy(),
                                        ['valid/error_rate'])
  assert np.all(best['best_valid/error_rate'].to_numpy() <= 0.9)
  ds2, sdk2, q2 = pd1_data.grid2020(
      jax.random.PRNGKey(0), p_observed=0.5, verbose=False,
      experiment_df=df)
  assert sdk2 == sdk
  np.testing.assert_allclose(np.asarray(q2.x), np.asarray(queried.x))
