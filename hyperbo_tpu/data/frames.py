"""Dataframe -> multi-task SubDataset pipeline.

Behavioral parity with the reference's processing chain
(hyperbo/bo_utils/data.py:103-353): per-study-group extraction, the
matched-trial pivot that builds aligned n x m evaluation matrices
(including the NaN-group combination sweep), held-out test-task sampling,
input/output warping, and task/data removal knobs.
"""

from __future__ import annotations

import itertools
import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyperbo_tpu.core import defs

SubDataset = defs.SubDataset


def sample_dataframe(key, df, p_remove=0.):
  """Keep a random (1 - p_remove) fraction of the dataframe rows."""
  if p_remove < 0 or p_remove >= 1:
    raise ValueError(f'p_remove={p_remove} but p_remove must be <1 and >= 0.')
  if p_remove > 0:
    n_remain = int(np.ceil((1 - p_remove) * len(df)))
    df = df.sample(n=n_remain, replace=False, random_state=int(key[0]))
  return df


def get_dataset(trials, study_identifier, labels, verbose=True):
  """One SubDataset per study group: x from labels[:-1], y from labels[-1]."""
  dataset = {}
  for sg in trials[study_identifier].unique():
    study_trials = trials.loc[trials[study_identifier] == sg, labels]
    dataset[sg] = SubDataset(
        x=jnp.array(study_trials[labels[:-1]].to_numpy()),
        y=jnp.array(study_trials[labels[-1:]].to_numpy()))
  msg = f'dataset before align: {jax.tree.map(jnp.shape, dataset)}'
  logging.info(msg)
  if verbose:
    print(msg)
  return dataset


def _observation_table(aligned_trials, study_identifier, labels):
  """Dense (unique-hparam-row x group) metric table + observation mask.

  Rows are the lexicographically sorted unique hyperparameter tuples;
  columns are the study groups in order of first appearance. A duplicate
  (hparam row, group) evaluation is an error (the trials do not define a
  single matched table).

  Returns (uniq_x, groups, table, observed).
  """
  groups = list(aligned_trials[study_identifier].unique())
  g_index = {g: j for j, g in enumerate(groups)}
  xs = aligned_trials[labels[:-1]].to_numpy()
  gidx = np.array([g_index[g] for g in aligned_trials[study_identifier]])
  ys = aligned_trials[labels[-1]].to_numpy(dtype=float)

  uniq_x, row_ids = np.unique(xs, axis=0, return_inverse=True)
  n, num_g = uniq_x.shape[0], len(groups)
  flat = row_ids * num_g + gidx
  if np.unique(flat).size != flat.size:
    raise ValueError(
        'duplicate (hyperparameter row, study group) evaluations; the '
        'aligned trials do not define a single matched table.')
  table = np.full((n, num_g), np.nan)
  table[row_ids, gidx] = ys
  observed = np.zeros((n, num_g), dtype=bool)
  observed[row_ids, gidx] = True
  return uniq_x, groups, table, observed


def _subsample_rows(key, n, p_remove):
  """Row indices kept by a (1 - p_remove) subsample (None = keep all)."""
  if p_remove < 0 or p_remove >= 1:
    raise ValueError(f'p_remove={p_remove} but p_remove must be <1 and >= 0.')
  if p_remove == 0:
    return None
  n_remain = int(np.ceil((1 - p_remove) * n))
  keep = np.random.RandomState(int(key[0])).choice(
      n, size=n_remain, replace=False)
  return np.sort(keep)


def get_aligned_dataset(trials,
                        study_identifier,
                        labels,
                        key=None,
                        p_remove=0.,
                        verbose=True):
  """Build aligned n x m SubDatasets from matched trials.

  For each aligned_suffix (phase), the matched trials define an
  observation table: unique hyperparameter rows x study groups, with a
  boolean observed-mask (not every group evaluated every row). Groups
  with missing observations are swept combinatorially (up to 2 dropped
  groups, the same bound the reference uses at
  hyperbo/bo_utils/data.py:115-173): dropping a subset of those groups
  selects the rows that are unobserved by ALL dropped groups and
  observed by ALL remaining ones — pure mask algebra on the observation
  matrix — and each non-empty selection becomes one SubDataset whose y
  columns are the remaining groups.
  """
  aligned_dataset = {}
  trials = trials[trials['aligned']]
  for aligned_suffix in trials['aligned_suffix'].unique():
    aligned_trials = trials[trials['aligned_suffix'] == aligned_suffix]
    uniq_x, groups, table, observed = _observation_table(
        aligned_trials, study_identifier, labels)
    g_index = {g: j for j, g in enumerate(groups)}

    # Sorted so multi-group drop keys match the reference (whose pivot
    # sorts its columns lexicographically).
    gap_groups = sorted(g for j, g in enumerate(groups)
                        if not observed[:, j].all())
    max_dropped = min(3, len(gap_groups) + 1, len(groups) - 1)
    for dropped in itertools.chain.from_iterable(
        itertools.combinations(gap_groups, r) for r in range(max_dropped)):
      remain = [g for g in groups if g not in dropped]
      remain_idx = [g_index[g] for g in remain]
      sel = observed[:, remain_idx].all(axis=1)
      if dropped:
        drop_idx = [g_index[g] for g in dropped]
        sel &= ~observed[:, drop_idx].any(axis=1)
      if not sel.any():
        continue
      x_rows = uniq_x[sel]
      y_rows = table[np.ix_(sel, remain_idx)]
      if verbose:
        print('removed groups:', dropped, '| remaining:', remain,
              '| rows:', x_rows.shape[0])
      if key is not None:
        key, subkey = jax.random.split(key, 2)
        keep = _subsample_rows(subkey, x_rows.shape[0], p_remove)
        if keep is not None:
          x_rows, y_rows = x_rows[keep], y_rows[keep]
      aligned_key = ';'.join(list(dropped) + [aligned_suffix])
      aligned_dataset[aligned_key] = SubDataset(
          x=jnp.array(x_rows),
          y=jnp.array(y_rows),
          aligned=';'.join(remain + [aligned_suffix]))
  msg = f'aligned dataset: {jax.tree.map(jnp.shape, aligned_dataset)}'
  logging.info(msg)
  if verbose:
    print(msg)
  return aligned_dataset


def sample_sub_dataset(key,
                       trials,
                       study_identifier,
                       labels,
                       p_observed=0.,
                       verbose=True,
                       sub_dataset_key=None):
  """Split one study group out of the trials as the held-out test task.

  A (1 - p_observed) fraction of the chosen group's rows becomes the
  queryable test set and is removed from the remaining trials.

  Returns: (remaining_trials, sub_dataset_key, queried_sub_dataset).
  """
  test_study_key, observed_key = jax.random.split(key, 2)
  study_groups = trials[study_identifier].unique()
  if sub_dataset_key is None:
    sub_dataset_id = int(jax.random.choice(test_study_key,
                                           len(study_groups)))
    sub_dataset_key = study_groups[sub_dataset_id]
  elif sub_dataset_key not in study_groups:
    raise ValueError(f'{sub_dataset_key} must be in dataframe.')

  queried_trials = trials[trials[study_identifier] ==
                          sub_dataset_key].sample(
                              frac=1. - p_observed, replace=False,
                              random_state=int(observed_key[0]))
  trials = trials.drop(queried_trials.index)

  queried_sub_dataset = SubDataset(
      x=jnp.array(queried_trials[labels[:-1]].to_numpy()),
      y=jnp.array(queried_trials[labels[-1:]].to_numpy()))
  msg = (f'removed study={sub_dataset_key}, '
         f'shape x={queried_sub_dataset.x.shape} '
         f'y={queried_sub_dataset.y.shape}')
  logging.info(msg)
  if verbose:
    print(msg)
  return trials, sub_dataset_key, queried_sub_dataset


def process_dataframe(key,
                      trials,
                      study_identifier,
                      labels,
                      p_observed=0.,
                      maximize_metric=True,
                      warp_func=None,
                      verbose=True,
                      sub_dataset_key=None,
                      num_remove=0,
                      p_remove=0.):
  """Full pipeline: warp columns, split test task, remove tasks/data,
  build aligned + per-group datasets.

  Returns: (dataset, sub_dataset_key, queried_sub_dataset).
  """
  trials = trials[[study_identifier] + labels +
                  ['aligned', 'aligned_suffix']].copy(deep=True)
  trials = trials.dropna()
  if verbose:
    print('trials:', trials.shape)

  warp_func = dict(warp_func) if warp_func else {}
  logging.info('warp_func = %s', warp_func)
  if labels[-1] not in warp_func and not maximize_metric:
    # Metric is minimized and not otherwise warped: negate it so BO can
    # always maximize.
    warp_func[labels[-1]] = lambda x: -x
  for la, fun in warp_func.items():
    if la in labels:
      trials.loc[:, la] = fun(trials.loc[:, la])
  assert len(trials) == len(trials.dropna()), (
      f'nan appeared after applying warp_func={warp_func}')

  key, subkey = jax.random.split(key)
  trials, sub_dataset_key, queried_sub_dataset = sample_sub_dataset(
      key=subkey, trials=trials, study_identifier=study_identifier,
      labels=labels, p_observed=p_observed, verbose=verbose,
      sub_dataset_key=sub_dataset_key)

  for _ in range(num_remove):
    key, subkey = jax.random.split(key)
    removed_sub_dataset_key = None
    # Prefer removing a task on the same dataset as the test task
    # (second comma field of the key), mirroring the reference heuristic.
    sub_dataset_key_split = sub_dataset_key.split(',')
    if len(sub_dataset_key_split) > 1:
      task_dataset_name = sub_dataset_key_split[1]
      for s in trials[study_identifier].unique():
        if task_dataset_name in s:
          removed_sub_dataset_key = s
    trials, _, _ = sample_sub_dataset(
        key=subkey, trials=trials, study_identifier=study_identifier,
        labels=labels, p_observed=p_observed, verbose=verbose,
        sub_dataset_key=removed_sub_dataset_key)
    if trials.empty:
      raise ValueError(
          f'All datapoints are removed. Is num_remove={num_remove} too '
          'large?')

  key, subkey = jax.random.split(key)
  aligned_dataset = get_aligned_dataset(
      trials=trials, study_identifier=study_identifier, labels=labels,
      key=subkey, p_remove=p_remove, verbose=verbose)
  key, subkey = jax.random.split(key)
  trials = sample_dataframe(subkey, trials, p_remove=p_remove)

  dataset = get_dataset(trials=trials, study_identifier=study_identifier,
                        labels=labels, verbose=verbose)
  dataset.update(aligned_dataset)
  return dataset, sub_dataset_key, queried_sub_dataset


def perturb_dataset_with_flat_functions(dataset, maxval):
  """Ablation: add one flat-function sub-dataset per existing one."""
  rand_key = jax.random.PRNGKey(0)
  flat_dataset = {}
  for name, d in dataset.items():
    if not isinstance(d, SubDataset):
      raise ValueError('sub_dataset must be instantiated by SubDataset.')
    rand_key, subkey = jax.random.split(rand_key)
    flat_val = jax.random.uniform(subkey, d.y.shape, minval=0, maxval=maxval)
    if d.aligned:
      dataset[name] = SubDataset(
          x=d.x, y=jnp.concatenate((d.y, flat_val)), aligned=d.aligned)
    else:
      flat_dataset[f'{name}flat'] = SubDataset(d.x, flat_val)
  dataset.update(flat_dataset)
  return dataset
