"""Plotting utilities for BO result figures.

Behavioral parity with reference hyperbo/plot_utils/utils.py:22-267:
mean+-std and median+-percentile band plots, multi-method regret curves
with log-scale options, and the violin-plot summary figure with
per-trial slices (including the paper's H-EKL 242-vs-2000 datapoint
x-axis scaling used in the max-training-datapoints ablation figure).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import matplotlib
matplotlib.use('Agg')  # headless by default; callers may switch backends
import matplotlib.pyplot as plt
import numpy as np

# x-axis rescaling for the max-training-datapoints ablation ('n_remain'
# figures): H-EKL trains on the 242-point aligned set, other methods on
# up to 2000 points per task.
_NREMAIN_EKL_SCALE = 242
_NREMAIN_DEFAULT_SCALE = 2000


def plot_with_upper_lower(x, line, lower, upper, color='r', ax=None,
                          set_xticks=False, **plot_kwargs):
  """Line with a shaded band between lower and upper."""
  if ax is None:
    plt.figure()
    ax = plt.gca()
  if 'n_remain' in plot_kwargs:
    assert 'label' in plot_kwargs, 'Must provide a label for each line.'
    scale = (_NREMAIN_EKL_SCALE if plot_kwargs['label'] == 'H-EKL'
             else _NREMAIN_DEFAULT_SCALE)
    x = np.asarray(x) * scale
    plot_kwargs.pop('n_remain')
  ax.fill_between(x, lower, upper, alpha=.1, color=color)
  ax.plot(x, line, color=color, **plot_kwargs)
  if set_xticks:
    ax.set_xticks(x)


def plot_array_mean_std(array, color, x=None, ax=None, axis=0,
                        **plot_kwargs):
  """Mean curve with +-1 std band over experiment repetitions."""
  mean, std = np.mean(array, axis=axis), np.std(array, axis=axis)
  if x is None:
    x = range(1, len(mean) + 1)
  plot_with_upper_lower(x, mean, mean - std, mean + std, color, ax,
                        **plot_kwargs)


def plot_array_median_percentile(array, color, x=None, ax=None,
                                 percentile=20, **plot_kwargs):
  """Median curve with [pct, 100-pct] percentile band."""
  lower, median, upper = np.percentile(
      array, [percentile, 50, 100 - percentile], axis=0)
  if x is None:
    x = range(1, len(median) + 1)
  plot_with_upper_lower(x, median, lower, upper, color, ax, **plot_kwargs)


def plot_all(label2array, ax, logscale_x=False, logscale_y=True,
             ylabel='Regret', xlabel='BO Iters', method='mean',
             colors=None, **kwargs):
  """Multi-method regret curves on one axis."""
  if colors is None:
    raise ValueError('Must define colors: dict mapping from label to color.')
  if len(label2array) > len(colors):
    raise AssertionError(
        f'max number of lines to plot is {len(colors)}, '
        f'got {len(label2array)}')
  labels = list(label2array.keys())
  if all(la in colors for la in labels):
    iteritems = [(colors[la], la) for la in labels]
  else:
    iteritems = list(zip(list(colors.values())[:len(labels)], labels))

  for color, label in iteritems:
    if label not in label2array or label2array[label] is None:
      continue
    y_array = np.array(label2array[label])
    if method == 'mean':
      plot_array_mean_std(y_array, ax=ax, label=label, color=color,
                          **kwargs)
    elif method == 'median':
      plot_array_median_percentile(y_array, ax=ax, label=label,
                                   color=color, **kwargs)
    if logscale_x:
      ax.set_xscale('log')
    if logscale_y:
      ax.set_yscale('log')
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)


def set_violin_axis_style(ax, labels):
  """x-axis styling for violin plots."""
  ax.xaxis.set_tick_params(direction='out')
  ax.xaxis.set_ticks_position('bottom')
  ax.set_xticks(np.arange(1, len(labels) + 1))
  ax.set_xticklabels(labels, rotation=45)
  ax.set_xlim(0.5, len(labels) + 0.5)


def _violin_slice(ax, data, labels, colors, title):
  """One violin plot of per-method metric distributions at a trial."""
  q1s, medians, q3s = [], [], []
  for d in data:
    q1, q2, q3 = np.percentile(d, [20, 50, 80])
    q1s.append(q1)
    medians.append(q2)
    q3s.append(q3)
  parts = ax.violinplot(data, showmedians=False, showextrema=False)
  inds = np.arange(1, len(medians) + 1)
  ax.scatter(inds, medians, marker='o', color='white', s=10, zorder=3)
  ax.vlines(inds, q1s, q3s, color='k', linestyle='-', lw=1.5)
  for pc, la in zip(parts['bodies'], labels):
    pc.set_facecolor(colors[la])
    pc.set_edgecolor('black')
    pc.set_alpha(1)
  ax.set_title(title)
  set_violin_axis_style(ax, labels)


def plot_summary(labels, label2array, xlim=(1, 100), ylim=None,
                 logscale_x=True, logscale_y=True, ylabel='Regret',
                 xlabel='BO Iters', method='mean', title=None,
                 violin_trials=None, violin_labels=None, figsize=(24, 6),
                 colors=None, fig_axes=None, uppercenter_legend=True,
                 uppercenter_legend_ncol=3, bbox_to_anchor=(0.5, 1.1),
                 **kwargs):
  """Summary figure: regret curves + optional violin slices at trials.

  Returns the matplotlib figure.
  """
  if colors is None:
    raise ValueError('Must define colors: dict mapping from label to color.')
  n_remain = 'n_remain' in kwargs

  num_violins = len(violin_trials) if violin_trials else 0
  if fig_axes is None or len(np.atleast_1d(fig_axes[1])) < num_violins + 1:
    fig, axes = plt.subplots(nrows=1, ncols=num_violins + 1,
                             figsize=figsize)
  else:
    fig, axes = fig_axes
  axes = np.atleast_1d(axes)

  plot_all({la: label2array.get(la, None) for la in labels}, axes[0],
           logscale_x=logscale_x, logscale_y=logscale_y, ylabel=ylabel,
           xlabel=xlabel, method=method, colors=colors, **kwargs)
  fig.tight_layout()
  if uppercenter_legend:
    axes[0].legend(loc='upper center', bbox_to_anchor=bbox_to_anchor,
                   ncol=uppercenter_legend_ncol, fancybox=True,
                   shadow=True)
  if ylim:
    axes[0].set_ylim(ylim[0], ylim[1])
  if xlim:
    axes[0].set_xlim(xlim[0], xlim[1])
  if title:
    axes[0].set_title(title)

  if not violin_trials or not violin_labels:
    return fig

  for i, trial in enumerate(violin_trials):
    data = []
    if n_remain:
      if 'x' not in kwargs:
        raise KeyError('The key "x" is not in kwargs.')
      x = np.asarray(kwargs['x'])
      num_data = round(x[trial] * _NREMAIN_DEFAULT_SCALE)
    else:
      num_data = kwargs['x'][trial] if 'x' in kwargs else trial + 1
    for la in violin_labels:
      la_trial = trial
      if n_remain and la == 'H-EKL':
        # H-EKL x positions scale by 242; find the largest index whose
        # datapoint count stays within num_data.
        la_trial = None
        for j, p in enumerate(x):
          if p * _NREMAIN_EKL_SCALE <= num_data:
            la_trial = j
          else:
            break
        if la_trial is None:
          raise ValueError(
              f'H-EKL does not have less than {num_data} datapoints.')
      data.append(np.array(label2array[la])[:, la_trial])
    _violin_slice(axes[i + 1], data, violin_labels, colors,
                  f'{xlabel} = {num_data}')
  return fig
