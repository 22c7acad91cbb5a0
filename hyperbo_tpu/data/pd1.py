"""PD1 / PD2 hyperparameter-tuning dataset loaders and MAF export.

Parity with reference hyperbo/bo_utils/data.py:37-42,356-572,580-646:
same file map, hyperparameter labels, input warps (momentum -> log(1-x),
lr -> log) and output warp (error rate -> -log(x + 1e-10)), the
deduplicate/normalize MAF export, and the output warper builder.

Fixes over the OSS reference: pd2 takes an explicit `data_files` map
instead of referencing an undefined global (reference data.py:613), and
both loaders fail with a clear FileNotFoundError when the data files are
absent.
"""

from __future__ import annotations

import logging
import pickle
from typing import Dict, Optional, Tuple

import jax
import numpy as np
import pandas as pd

from hyperbo_tpu.core import defs
from hyperbo_tpu.data import frames

SubDataset = defs.SubDataset

PD1 = {
    ('phase0', 'matched'): '../pd1/pd1_matched_phase0_results.jsonl',
    ('phase1', 'matched'): '../pd1/pd1_matched_phase1_results.jsonl',
    ('phase0', 'unmatched'): '../pd1/pd1_unmatched_phase0_results.jsonl',
    ('phase1', 'unmatched'): '../pd1/pd1_unmatched_phase1_results.jsonl',
}

LESS_POINTS_WORKLOAD = 'imagenet_resnet50,imagenet,resnet,resnet50,1024'

PD1_LABELS = [
    'hps.lr_hparams.decay_steps_factor',
    'hps.lr_hparams.initial_value',
    'hps.lr_hparams.power',
    'hps.opt_hparams.momentum',
]

PD2_LABELS = [
    'hps.lr_hparams.decay_steps_factor',
    'hps.lr_hparams.initial_value',
    'hps.lr_hparams.power',
    'hps.opt_hparams.beta1',
    'hps.opt_hparams.epsilon',
]


def _read_jsonl(path: str, numeric_cols):
  """Read a JSONL trial table: native scanner first, pandas fallback.

  The native C++ scanner (hyperbo_tpu/native/fastjsonl.cpp) extracts only
  the columns the loader consumes in one linear pass; pandas.read_json
  handles anything the scanner's flat-JSON assumption cannot.
  """
  from hyperbo_tpu.native import jsonl as native_jsonl
  cols = list(numeric_cols)
  # pandas.to_json escapes '/' as '\/'; sniff the file head and match the
  # writer's key spelling.
  try:
    with open(path, 'rb') as f:
      head = f.read(4096).decode(errors='replace')
    if '\\/' in head:
      cols = [c.replace('/', '\\/') for c in cols]
  except OSError:
    pass
  parsed = native_jsonl.parse_jsonl(path, cols, 'study_group')
  if parsed is not None:
    values, groups = parsed
    # Sanity gate: a requested column that parsed as all-NaN means the
    # flat-JSON assumption failed for this file — use pandas.
    if (values.shape[0] > 0 and
        not np.any(np.all(np.isnan(values), axis=0))):
      df = pd.DataFrame(values, columns=list(numeric_cols))
      df['study_group'] = groups
      return df
  return pd.read_json(path, orient='records', lines=True,
                      precise_float=True)


def _load_trial_files(data_files: Dict[Tuple[str, str], str],
                      numeric_cols=None):
  """Read jsonl/pickle trial tables, tagging aligned phase metadata."""
  all_trials = []
  for (phase, matchedness), path in data_files.items():
    if path.endswith('.pkl') or '.pkl' in path:
      with open(path, 'rb') as f:
        trials = pickle.load(f)
    elif numeric_cols is not None:
      trials = _read_jsonl(path, numeric_cols)
    else:
      trials = pd.read_json(path, orient='records', lines=True,
                            precise_float=True)
    trials.loc[:, 'aligned'] = (matchedness == 'matched')
    trials.loc[:, 'aligned_suffix'] = phase
    all_trials.append(trials)
  return pd.concat(all_trials).reset_index(drop=True)


def pd1(key,
        p_observed,
        verbose=True,
        sub_dataset_key=None,
        input_warp=True,
        output_log_warp=True,
        num_remove=0,
        metric_name='best_valid/error_rate',
        p_remove=0.,
        data_files=None):
  """Load PD1 (Nesterov phase) and pick/hold out a test study.

  Returns: (dataset, sub_dataset_key, queried_sub_dataset). The dataset
  contains per-workload sub-datasets (x: n x 4 warped hyperparameters,
  y: n x 1 warped error rate) plus aligned matched-phase sub-datasets.
  """
  if data_files is None:
    data_files = PD1.copy()
  labels = PD1_LABELS + [metric_name]
  trials = _load_trial_files(data_files, numeric_cols=labels)
  warp_func = {}
  if input_warp:
    warp_func = {
        'hps.opt_hparams.momentum': lambda x: np.log(1 - x),
        'hps.lr_hparams.initial_value': np.log,
    }
  if output_log_warp:
    warp_func['best_valid/error_rate'] = lambda x: -np.log(x + 1e-10)

  return frames.process_dataframe(
      key=key,
      trials=trials,
      study_identifier='study_group',
      labels=labels,
      p_observed=p_observed,
      maximize_metric=False,
      warp_func=warp_func if input_warp else None,
      verbose=verbose,
      sub_dataset_key=sub_dataset_key,
      num_remove=num_remove,
      p_remove=p_remove)


def pd2(key,
        p_observed,
        verbose=True,
        sub_dataset_key=None,
        input_warp=True,
        output_log_warp=True,
        num_remove=0,
        metric_name='best_valid/error_rate',
        p_remove=0.,
        data_files=None):
  """Load PD2 (Adam phase). Requires `data_files`: the OSS reference
  references an undefined PD2 global (data.py:613); here the map must be
  provided explicitly."""
  if data_files is None:
    raise FileNotFoundError(
        'pd2 requires data_files={(phase, matchedness): path}; the PD2 '
        'trial tables are not distributed with the package.')
  labels = PD2_LABELS + [metric_name]
  trials = _load_trial_files(data_files, numeric_cols=labels)
  warp_func = {}
  if input_warp:
    warp_func = {
        'hps.opt_hparams.beta1': lambda x: np.log(1 - x),
        'hps.lr_hparams.initial_value': np.log,
        'hps.opt_hparams.epsilon': np.log,
    }
  if output_log_warp:
    warp_func['best_valid/error_rate'] = lambda x: -np.log(x + 1e-10)

  return frames.process_dataframe(
      key=key,
      trials=trials,
      study_identifier='study_group',
      labels=labels,
      p_observed=p_observed,
      maximize_metric=False,
      warp_func=warp_func if input_warp else None,
      verbose=verbose,
      sub_dataset_key=sub_dataset_key,
      num_remove=num_remove,
      p_remove=p_remove)


GRID2020_LABELS = [
    'hps.opt_hparams.momentum',
    'hps.lr_hparams.initial_learning_rate',
    'hps.lr_hparams.power',
    'hps.lr_hparams.decay_steps_factor',
]


def _flatten_hparams(d, prefix='hps.'):
  """Nested hparams dict -> flat {'hps.a.b': value} columns."""
  out = {}
  for k, v in d.items():
    if isinstance(v, dict):
      out.update(_flatten_hparams(v, prefix=f'{prefix}{k}.'))
    else:
      out[f'{prefix}{k}'] = v
  return out


def add_best_eval_columns(df, metrics):
  """Per-trial best (minimum) of each eval-curve metric column.

  Mirrors init2winit's df_utils.add_best_eval_columns contract (used by
  reference data.py:690-691): each metric column holds the evaluation
  curve (sequence) or a scalar; 'best_<metric>' holds its minimum.
  """
  for metric in metrics:
    if metric not in df.columns:
      continue
    df[f'best_{metric}'] = df[metric].map(
        lambda v: float(np.min(v)) if np.ndim(v) > 0 else float(v))
  return df


def load_grid2020_directories(data_dirs,
                              metrics=('valid/ce_loss',
                                       'valid/error_rate')):
  """Scan init2winit-style experiment directories into a trial table.

  Self-contained replacement for init2winit's
  colab.data_loader.parallel_load_trials_in_directories (reference
  data.py:681-684; the OSS version also needs an undefined GRID2020
  global). Expected layout, one row per trial:

    <exp_dir>/<trial_*>/hparams.json       nested hps (incl. 'dataset')
    <exp_dir>/<trial_*>/measurements.csv   eval curve w/ metric columns
                        (or measurements.jsonl, records per line)

  Returns a dataframe with flattened 'hps.*' columns, a 'dataset' study
  column (hparams['dataset'], else the experiment dir name) and one
  eval-curve column per metric.
  """
  import json as json_lib
  import os
  rows = []
  for exp_dir in data_dirs:
    exp_name = os.path.basename(os.path.normpath(exp_dir))
    for trial_name in sorted(os.listdir(exp_dir)):
      trial_dir = os.path.join(exp_dir, trial_name)
      hparams_path = os.path.join(trial_dir, 'hparams.json')
      if not os.path.isfile(hparams_path):
        continue
      with open(hparams_path) as f:
        hparams = json_lib.load(f)
      row = {'hps.' + k if not k.startswith('hps.') else k: v
             for k, v in _flatten_hparams(hparams, prefix='').items()}
      row['dataset'] = hparams.get('dataset', exp_name)
      row['trial_dir'] = trial_dir
      csv_path = os.path.join(trial_dir, 'measurements.csv')
      jsonl_path = os.path.join(trial_dir, 'measurements.jsonl')
      if os.path.isfile(csv_path):
        meas = pd.read_csv(csv_path)
      elif os.path.isfile(jsonl_path):
        meas = pd.read_json(jsonl_path, orient='records', lines=True)
      else:
        continue
      for metric in metrics:
        if metric in meas.columns:
          row[metric] = np.asarray(meas[metric], dtype=float)
      rows.append(row)
  if not rows:
    raise FileNotFoundError(
        f'No trials found under {list(data_dirs)}; expected '
        '<exp_dir>/<trial>/hparams.json + measurements.csv|jsonl.')
  return pd.DataFrame(rows)


def grid2020(key,
             p_observed,
             verbose=True,
             sub_dataset_key=None,
             input_warp=True,
             output_log_warp=True,
             num_remove=0,
             p_remove=0.,
             data_dirs=None,
             experiment_df=None):
  """Load GRID2020 (init2winit grid study) and pick a random test study.

  Parity with reference data.py:649-715 (same labels, momentum/lr input
  warps, -log error-rate output warp, study_identifier='dataset'), with
  the broken init2winit dependency replaced: pass `data_dirs` (scanned
  by load_grid2020_directories) or a pre-loaded `experiment_df`.

  Returns: (dataset, sub_dataset_key, queried_sub_dataset).
  """
  if experiment_df is None:
    if data_dirs is None:
      raise FileNotFoundError(
          'grid2020 requires data_dirs=[experiment directories] or '
          'experiment_df=<trial table>; the GRID2020 study is not '
          'distributed with the package.')
    experiment_df = load_grid2020_directories(data_dirs)
  experiment_df = add_best_eval_columns(
      experiment_df, ['valid/ce_loss', 'valid/error_rate'])
  experiment_df.loc[:, 'aligned'] = True
  experiment_df.loc[:, 'aligned_suffix'] = ''
  labels = GRID2020_LABELS + ['best_valid/error_rate']
  warp_func = {}
  if input_warp:
    warp_func = {
        'hps.opt_hparams.momentum': lambda x: np.log(1 - x),
        'hps.lr_hparams.initial_learning_rate': np.log,
    }
  if output_log_warp:
    warp_func['best_valid/error_rate'] = lambda x: -np.log(x + 1e-10)
  return frames.process_dataframe(
      key=key,
      trials=experiment_df,
      study_identifier='dataset',
      labels=labels,
      p_observed=p_observed,
      maximize_metric=False,
      warp_func=warp_func,
      verbose=verbose,
      sub_dataset_key=sub_dataset_key,
      num_remove=num_remove,
      p_remove=p_remove)


def _deduplicate(x, y, dataset_name, verbose=True):
  """Drop duplicate x rows, keeping the one with the highest y."""
  order = np.argsort(-y[:, 0], kind='stable')
  x_sorted, y_sorted = np.asarray(x)[order], np.asarray(y)[order]
  _, idx = np.unique(x_sorted, axis=0, return_index=True)
  if verbose:
    print(f'Removed {x_sorted.shape[0] - len(idx)} duplicated points from '
          f'{dataset_name}')
  return x_sorted[idx, :], y_sorted[idx, :]


def _normalize_maf_dataset(maf_dataset, num_hparams, neg_error_to_accuracy):
  """Min-max normalize X to [0,1] jointly; optionally map -err -> acc."""
  min_vals = np.ones(num_hparams) * np.inf
  max_vals = -np.ones(num_hparams) * np.inf
  for subdataset in maf_dataset.values():
    min_vals = np.minimum(min_vals, np.min(subdataset['X'], axis=0))
    max_vals = np.maximum(max_vals, np.max(subdataset['X'], axis=0))
  for k in maf_dataset:
    maf_dataset[k]['X'] = (maf_dataset[k]['X'] - min_vals) / (
        max_vals - min_vals)
    if neg_error_to_accuracy:
      maf_dataset[k]['Y'] = 1 + maf_dataset[k]['Y']
  return maf_dataset


def process_pd1_for_maf(outfile_path,
                        min_num_points,
                        input_warp,
                        output_log_warp,
                        neg_error_to_accuracy,
                        enforce_same_size_subdatasets,
                        verbose=True,
                        data_files=None):
  """Export PD1 in the MAF-baseline format (deduped, normalized, pickled)."""
  if output_log_warp and neg_error_to_accuracy:
    raise ValueError('Cannot transform y-values when the pd1 outputs are '
                     'log-warped!')
  key = jax.random.PRNGKey(0)
  dataset, _, _ = pd1(key, p_observed=1, input_warp=input_warp,
                      output_log_warp=output_log_warp,
                      data_files=data_files)
  num_hparams = dataset[list(dataset.keys())[0]].x.shape[1]
  excluded = [LESS_POINTS_WORKLOAD]

  maf_dataset = {}
  for k, subdataset in dataset.items():
    if subdataset.aligned is None and k not in excluded:
      x, y = _deduplicate(np.array(subdataset.x), np.array(subdataset.y),
                          dataset_name=k, verbose=verbose)
      if x.shape[0] > min_num_points:
        maf_dataset[k] = dict(X=x, Y=y)

  if enforce_same_size_subdatasets:
    min_size = min(md['X'].shape[0] for md in maf_dataset.values())
    for k in maf_dataset:
      maf_dataset[k] = dict(X=maf_dataset[k]['X'][:min_size, :],
                            Y=maf_dataset[k]['Y'][:min_size, :])
  maf_dataset = _normalize_maf_dataset(
      maf_dataset, num_hparams=num_hparams,
      neg_error_to_accuracy=neg_error_to_accuracy)
  logging.info('MAF export: %d sub-datasets -> %s', len(maf_dataset),
               outfile_path)
  with open(outfile_path, 'wb') as f:
    pickle.dump(maf_dataset, f, pickle.HIGHEST_PROTOCOL)


def get_output_warper(output_log_warp=True, return_warping=False):
  """Output warper -log(1 + 1e-6 - y) for y <= 1 (error-rate surrogate)."""
  if output_log_warp:

    def output_warping(f):

      def warped_f(x_array):
        y = f(x_array)
        if not np.all(y <= 1. + 1e-11):
          raise ValueError(f'Use output_log_warp only if f({x_array})={y} '
                           'is smaller than or equal to 1.')
        ret = -np.log(1. + 1e-6 - y)
        assert np.all(np.isfinite(ret)), f'y={y} caused ret={ret}.'
        return ret

      return warped_f
  else:
    output_warping = lambda f: f
  output_warper = output_warping(lambda x: x)
  if return_warping:
    return output_warper, output_warping
  return output_warper


def normalize(y, eps=1e-12):
  """Min-max normalize a vector."""
  return (y - np.min(y)) / (np.max(y) - np.min(y) + eps)
