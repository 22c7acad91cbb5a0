"""Deterministic generator for the miniature PD1-format jsonl fixture.

Reproduces the *format* of the PD1 trial tables (reference
hyperbo/bo_utils/data.py:356-443: one JSON record per trial with the four
Nesterov hyperparameter columns, a 'best_valid/error_rate' metric and a
'study_group' workload tag; matched files share a hyperparameter grid
across workloads, with per-workload holes) at a few-KB scale so the full
fastjsonl -> pivot -> pre-train -> BO -> analysis path runs in CI.

Run from the repo root:  python tests/fixtures/pd1_mini/generate.py
"""

import os

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))

LABELS = [
    'hps.lr_hparams.decay_steps_factor',
    'hps.lr_hparams.initial_value',
    'hps.lr_hparams.power',
    'hps.opt_hparams.momentum',
]
METRIC = 'best_valid/error_rate'
WORKLOADS = [
    'mini_cifar,cifar10,wrn,wrn16,256',
    'mini_mnist,mnist,cnn,cnn3,512',
    'mini_lm,lm1b,xfmr,xfmr2,128',
    'mini_svhn,svhn,wrn,wrn16,1024',
]


def _error_rate(rng, hp, workload_idx):
  """Smooth synthetic response in (0, 1): better near a per-workload
  optimum, plus noise."""
  opt = np.array([0.6, np.log(0.1), 1.0, np.log(1 - 0.9)])
  z = np.array([hp[0], np.log(hp[1]), hp[2], np.log(1 - hp[3])])
  shift = 0.15 * workload_idx
  dist = np.sum((z - opt - shift) ** 2 / np.array([1., 4., 1., 4.]))
  base = 0.08 + 0.12 * workload_idx
  return float(np.clip(base + 0.4 * (1 - np.exp(-0.5 * dist)) +
                       0.01 * rng.normal(), 0.02, 0.95))


def _sample_hp(rng):
  return [
      float(rng.uniform(0.1, 0.99)),          # decay_steps_factor
      float(np.exp(rng.uniform(np.log(1e-3), np.log(1.0)))),  # lr init
      float(rng.uniform(0.1, 2.0)),            # power
      float(rng.uniform(0.1, 0.98)),           # momentum
  ]


def main():
  rng = np.random.RandomState(20260816)
  for phase in ('phase0', 'phase1'):
    grid = [_sample_hp(rng) for _ in range(10)]
    rows = []
    for wi, wl in enumerate(WORKLOADS):
      for gi, hp in enumerate(grid):
        # holes: workload 1 misses the last 2 grid points, workload 3
        # misses the first one -> exercises the drop-group sweep.
        if (wi == 1 and gi >= 8) or (wi == 3 and gi == 0):
          continue
        rec = dict(zip(LABELS, hp))
        rec[METRIC] = _error_rate(rng, hp, wi)
        rec['study_group'] = wl
        rows.append(rec)
    pd.DataFrame(rows).to_json(
        os.path.join(HERE, f'pd1_matched_{phase}_results.jsonl'),
        orient='records', lines=True)

    rows = []
    for wi, wl in enumerate(WORKLOADS):
      for _ in range(16):
        hp = _sample_hp(rng)
        rec = dict(zip(LABELS, hp))
        rec[METRIC] = _error_rate(rng, hp, wi)
        rec['study_group'] = wl
        rows.append(rec)
    pd.DataFrame(rows).to_json(
        os.path.join(HERE, f'pd1_unmatched_{phase}_results.jsonl'),
        orient='records', lines=True)
  print('fixture written to', HERE)


if __name__ == '__main__':
  main()
