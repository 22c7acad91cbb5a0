"""Hardware probe: reusable-runner steady state + batched-chol kernels.

Follows r3_pd1_step_probe's finding that the PD1 headline was ~95% host
retrace: validates on the chip that

  1. make_fit_adam_packed's runner trains 1000 PD1-scale steps in
     ~0.35-0.7 s steady-state (cached jit object, no per-call retrace);
  2. the batched small-n Cholesky kernels (ops/pallas_batch_chol:
     'tasks3d' sublane-vectorized and 'grid2d' per-task) COMPILE under
     the real Mosaic toolchain and how they time against the XLA
     while-loop pipeline in a loss-only scan and in the full train step.

Leg 2 gates whether models/packed._batched_chol_route keeps its
auto-on-TPU default.

Run:  nohup python benchmarks/r3_runner_probe.py > /tmp/runner_probe.log 2>&1 &
Never timeout-kill this process (wedges the tunnel); it deadlines itself.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()
DEADLINE_S = 75 * 60.0


def log(msg):
  print(f'[{time.time() - T0:8.1f}s] {msg}', flush=True)


def left():
  return DEADLINE_S - (time.time() - T0)


log('importing jax (tunnel admission may take many minutes)...')
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

log(f'devices: {jax.devices()}')
v = float(jnp.ones((64, 64)).sum())
log(f'admitted; warmup sum={v}')

import optax  # noqa: E402
from flax import linen as nn  # noqa: E402
from hyperbo_tpu.core import defs  # noqa: E402
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC  # noqa: E402
from hyperbo_tpu.models import basis as bf  # noqa: E402
from hyperbo_tpu.models import kernel, mean  # noqa: E402
from hyperbo_tpu.models import packed as packed_lib  # noqa: E402
from hyperbo_tpu.train import adam as adam_lib  # noqa: E402

results = {}
TASKS, POINTS, DIM, STEPS = 23, 2048, 4, 1000


def timed_scalar(fn, *args, iters=2):
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    float(fn(*args))
    times.append(time.perf_counter() - t0)
  return min(times)


def build():
  key = jax.random.PRNGKey(0)
  dataset = {}
  for i in range(TASKS):
    k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
    x = jax.random.uniform(k1, (POINTS, DIM))
    w = jax.random.normal(k2, (DIM, 1))
    y = jnp.sin(3 * x @ w) + 0.1 * jax.random.normal(k2, (POINTS, 1))
    dataset[f'workload{i}'] = defs.SubDataset(x, y)
  params = defs.GPParams(
      model={'constant': 0., 'lengthscale': jnp.zeros(8),
             'signal_variance': 0., 'noise_variance': -4.},
      config={'method': 'adam', 'learning_rate': 1e-2,
              'max_training_step': STEPS, 'batch_size': 100,
              'objective': 'nll', 'mlp_features': (8, 8),
              'fast_subsample': True})
  bf.init_mlp_with_shape(jax.random.PRNGKey(1), params, (0, DIM))
  params.model['linear_mean'] = nn.Dense(1).init(
      jax.random.PRNGKey(2), jnp.empty((0, 8)))['params']
  packed, _ = packed_lib.pack_dataset(dataset, pad_to_multiple=128)
  return params, packed


params, packed = build()

# --- 1. steady-state reusable runner, per batched_chol setting --------
for setting, tag in ((False, 'xla'), ('tasks3d', 'tasks3d'),
                     ('grid2d', 'grid2d')):
  if left() < 15 * 60 and tag != 'xla':
    log(f'deadline guard: skipping runner[{tag}]')
    continue
  config = dict(params.config)
  config['batched_chol'] = setting
  runner = adam_lib.make_fit_adam_packed(
      mean.linear_mlp, kernel.squared_exponential_mlp, config,
      warp_func=DEFAULT_WARP_FUNC)
  model0 = dict(params.model)

  def call(seed, runner=runner, model0=model0):
    _, losses = runner(model0, packed, jax.random.PRNGKey(seed))
    return losses[-1]

  log(f'compiling runner[{tag}]...')
  try:
    t0 = time.perf_counter()
    l1 = float(call(3))
    t_first = time.perf_counter() - t0
    log(f'runner[{tag}] compile+{STEPS} steps: {t_first:.1f}s, '
        f'final loss {l1:.2f}')
    t = timed_scalar(call, 4)
    results[f'runner_{tag}_s_per_1000'] = t
    log(f'runner[{tag}] steady-state: {t:.3f}s per {STEPS} steps '
        f'({t / STEPS * 1e3:.3f} ms/step)')
  except Exception as e:  # noqa: BLE001
    log(f'runner[{tag}] FAILED: {type(e).__name__}: {e}')
    results[f'runner_{tag}_error'] = f'{type(e).__name__}'

# --- 2. loss-only scans: XLA pipeline vs batched kernels --------------
S = 400
model0 = dict(params.model)
packed_pp = packed_lib.prepermute_packed(jax.random.PRNGKey(5), packed)

for setting, tag in ((False, 'xla'), ('tasks3d', 'tasks3d'),
                     ('grid2d', 'grid2d')):
  if left() < 8 * 60:
    log(f'deadline guard: skipping loss[{tag}]')
    break
  config = dict(params.config)
  config['batched_chol'] = setting

  def loss_fn(model, batch, config=config):
    shim = defs.GPParams(model=model, config=config)
    return packed_lib.neg_log_marginal_likelihood_packed(
        mean.linear_mlp, kernel.squared_exponential_mlp, shim, batch,
        warp_func=DEFAULT_WARP_FUNC)

  @jax.jit
  def loss_scan(packed_pp, loss_fn=loss_fn):
    def step(acc, k):
      batch = packed_lib.subsample_packed_window(k, packed_pp, 100)
      return acc + loss_fn(model0, batch), ()
    acc, _ = lax.scan(step, jnp.float32(0.),
                      jax.random.split(jax.random.PRNGKey(8), S))
    return acc

  try:
    float(loss_scan(packed_pp))
    t = timed_scalar(loss_scan, packed_pp)
    results[f'loss_{tag}_ms_per_step'] = t / S * 1e3
    log(f'loss[{tag}]: {t / S * 1e3:.3f} ms/step')
  except Exception as e:  # noqa: BLE001
    log(f'loss[{tag}] FAILED: {type(e).__name__}: {e}')
    results[f'loss_{tag}_error'] = f'{type(e).__name__}'

log('RESULTS ' + json.dumps(results))
log('RUNNER_PROBE_DONE')
