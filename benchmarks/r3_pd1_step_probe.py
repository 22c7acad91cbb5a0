"""Hardware probe: dissect the PD1-scale packed training step.

The headline bench leg (bench.py pd1 mode) runs ~6.3 ms/step on the v5e
for ~20 MFLOP of per-step math — ~300x off the compute floor, so the
step is overhead-bound. This probe times the step's components at bench
scale (23 tasks x 2048 pts, batch 100, MLP-SE kernel) to find where the
milliseconds live. Prime suspect: the batched 100x100 Cholesky +
triangular solves, which XLA lowers to sequential row-at-a-time while
loops (TriangularSolveExpander / CholeskyExpander), paying per-iteration
dispatch ~100 sequential steps per solve.

Legs (each a lax.scan of S steps, cached-timed):
  1. full train step (value_and_grad + adam)      == bench leg
  2. loss-only forward
  3. subsample + gram only (no factorization)
  4. subsample + gram + batched cholesky + logdet (no solves)
  5. ...+ cho_solve (full forward linalg, no grad)
  6. subsample only
  7. full step at batch_size=128 (lane-aligned)
  8. unrolled rank-1 Cholesky alternative (no while loop) at 128

Run:  nohup python benchmarks/r3_pd1_step_probe.py > /tmp/pd1_step_probe.log 2>&1 &
Never timeout-kill this process (wedges the tunnel); it deadlines itself.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()
DEADLINE_S = 70 * 60.0


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
from hyperbo_tpu.ops import chol as chol_ops  # noqa: E402

results = {}
S = 200
TASKS, POINTS, DIM = 23, 2048, 4


def timed_scalar(fn, *args, iters=2):
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    float(fn(*args))
    times.append(time.perf_counter() - t0)
  return min(times)


def build(batch_size):
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
              'max_training_step': S, 'batch_size': batch_size,
              'objective': 'nll', 'mlp_features': (8, 8),
              'fast_subsample': True})
  bf.init_mlp_with_shape(jax.random.PRNGKey(1), params, (0, DIM))
  params.model['linear_mean'] = nn.Dense(1).init(
      jax.random.PRNGKey(2), jnp.empty((0, 8)))['params']
  packed, _ = packed_lib.pack_dataset(dataset, pad_to_multiple=128)
  packed = packed_lib.prepermute_packed(jax.random.PRNGKey(3), packed)
  return params, packed


def scan_of(fn, packed, batch_size, with_model=None):
  """lax.scan of S steps of fn(model, batch) over fresh window batches."""
  def run(packed):
    def step(carry, k):
      model, acc = carry
      batch = packed_lib.subsample_packed_window(k, packed, batch_size)
      out = fn(model, batch)
      return (model, acc + out), ()
    (_, acc), _ = lax.scan(
        step, (with_model, jnp.float32(0.)),
        jax.random.split(jax.random.PRNGKey(7), S))
    return acc
  return jax.jit(run)


def loss_fn_for(params):
  config = dict(params.config)
  def loss_fn(model, batch):
    shim = defs.GPParams(model=model, config=config)
    return packed_lib.neg_log_marginal_likelihood_packed(
        mean.linear_mlp, kernel.squared_exponential_mlp, shim, batch,
        warp_func=DEFAULT_WARP_FUNC)
  return loss_fn


def leg(name, jfn, *args):
  if left() < 8 * 60:
    log(f'deadline guard: skipping {name}')
    return None
  try:
    float(jfn(*args))
    t = timed_scalar(jfn, *args)
    results[name] = t / S * 1e3
    log(f'{name}: {t / S * 1e3:.3f} ms/step')
    return t
  except Exception as e:  # noqa: BLE001
    log(f'{name} FAILED: {type(e).__name__}: {e}')
    results[name + '_error'] = f'{type(e).__name__}'
    return None


for bs in (100, 128):
  params, packed = build(bs)
  loss_fn = loss_fn_for(params)
  model0 = dict(params.model)
  optimizer = optax.adam(1e-2)

  # 1/7. full fused train step (mirror fit_adam_scan's body).
  def full_run(packed, model0=model0, loss_fn=loss_fn, bs=bs):
    opt0 = optimizer.init(model0)
    def step(carry, k):
      model, opt_state = carry
      batch = packed_lib.subsample_packed_window(k, packed, bs)
      loss, grads = jax.value_and_grad(loss_fn)(model, batch)
      updates, opt_state = optimizer.update(grads, opt_state)
      model = optax.apply_updates(model, updates)
      return (model, opt_state), loss
    (_, _), losses = lax.scan(
        step, (model0, opt0),
        jax.random.split(jax.random.PRNGKey(9), S))
    return losses[-1]

  leg(f'full_step_bs{bs}', jax.jit(full_run), packed)

  # 2. loss-only forward.
  leg(f'loss_only_bs{bs}',
      scan_of(lambda m, b: loss_fn(m, b), packed, bs, model0), packed)

  if bs != 100:
    continue  # components only at the bench's batch size

  ls, sv, nv = 0.5, 1.0, 0.1

  def gram_of(batch):
    # MLP embed + SE gram for every task (mask algebra as nll_one_task).
    shim = defs.GPParams(model=model0, config=dict(params.config))
    def one(x, y, mask):
      kmat = kernel.squared_exponential_mlp(
          shim, x, warp_func=DEFAULT_WARP_FUNC)
      pair = mask[:, None] & mask[None, :]
      eye = jnp.eye(x.shape[0], dtype=kmat.dtype)
      diag = jnp.where(mask, nv, 1.0)
      return jnp.where(pair, kmat, 0.0) + eye * diag
    return jax.vmap(one)(batch.x, batch.y, batch.mask)

  # 3. subsample + gram.
  leg('gram_only',
      scan_of(lambda m, b: jnp.sum(gram_of(b)), packed, 100, model0),
      packed)

  # 4. + batched cholesky + logdet.
  def chol_leg(m, b):
    kb = gram_of(b)
    cb = chol_ops.cholesky(kb)
    return jnp.sum(jnp.log(jnp.diagonal(cb, axis1=-2, axis2=-1)))
  leg('gram_chol', scan_of(chol_leg, packed, 100, model0), packed)

  # 5. + cho_solve (full forward linalg).
  def solve_leg(m, b):
    kb = gram_of(b)
    cb = chol_ops.cholesky(kb)
    kinvy = chol_ops.cho_solve(cb, b.y)
    return (jnp.sum(b.y * kinvy)
            + jnp.sum(jnp.log(jnp.diagonal(cb, axis1=-2, axis2=-1))))
  leg('gram_chol_solve', scan_of(solve_leg, packed, 100, model0), packed)

  # 6. subsample only.
  leg('subsample_only',
      scan_of(lambda m, b: jnp.sum(b.x) + jnp.sum(b.y), packed, 100,
              model0), packed)

  # 8. unrolled rank-1 cholesky (static 100 steps, no while loop).
  def unrolled_chol(kb):
    n = kb.shape[-1]
    l = jnp.zeros_like(kb)
    a = kb
    for j in range(n):
      piv = jnp.sqrt(a[..., j, j])[..., None]          # (T,1)
      col = a[..., :, j] / piv                          # (T,n)
      rng = jnp.arange(n)
      col = jnp.where(rng[None, :] >= j, col, 0.0)
      l = l.at[..., :, j].set(col)
      a = a - col[..., :, None] * col[..., None, :]
    return l

  def unrolled_leg(m, b):
    kb = gram_of(b)
    cb = unrolled_chol(kb)
    return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(cb, axis1=-2,
                                                axis2=-1)) + 1e-20))
  leg('gram_unrolled_chol', scan_of(unrolled_leg, packed, 100, model0),
      packed)

log('RESULTS ' + json.dumps(results))
log('PD1_STEP_PROBE_DONE')
