"""Hardware probe: Matern-family + ragged-n fused MLL on the v5e chip.

Validates the round-3 fused-kernel extensions on real hardware in ONE
process (tunnel admission is paid once; see CLAUDE.md wedge notes):

  1. SE n=8192 timing sanity (expect ~5.25 ms/iter, PERF.md block-pivot
     table — regression guard for the kfam threading).
  2. matern32 / matern52 n=8192 fused timing (expect SE + small VPU
     cost: the transform adds ~5 ops per Gram element).
  3. Fused-vs-XLA-dense value agreement for both Matern orders (the
     rigorous parity gate is the interpret-mode test suite; here we
     only guard against a Mosaic miscompile, so the tolerance is the
     dense pipeline's own bf16 noise class).
  4. Ragged n=8000 through the masked kernel (sentinel padding to 8192)
     vs the dense pipeline at n=8000.
  5. matern52 value_and_grad step timing (custom-VJP train leg).

Run:  nohup python benchmarks/r3_matern_probe.py > /tmp/matern_probe.log 2>&1 &
Never timeout-kill this process (wedges the tunnel); it deadlines itself.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()
DEADLINE_S = 80 * 60.0


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

from hyperbo_tpu.ops import pallas_mll  # noqa: E402
from hyperbo_tpu.models import kernel as kernel_lib  # noqa: E402
from hyperbo_tpu.ops import chol as chol_ops  # noqa: E402
from hyperbo_tpu.core import defs  # noqa: E402

N, D, K = 8192, 8, 24
results = {}


def timed_scalar(fn, *args, iters=2):
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    float(fn(*args))
    times.append(time.perf_counter() - t0)
  return min(times)


key = jax.random.PRNGKey(1)
x = jax.random.uniform(key, (N, D), jnp.float32)
y = jax.random.normal(jax.random.PRNGKey(2), (N, 1), jnp.float32)
xs = x / 0.5


def fused_scan(kfam):
  @jax.jit
  def f(xs, y):
    def one(carry, bump):
      quad, ld = pallas_mll.mll_fused_g(
          xs, y, 1.0, 0.1 + bump, block=256, half=512, group=2,
          sweep_unroll=32, kfam=kfam)
      return carry + 0.5 * quad + ld, ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, K))
    return tot
  return f


for kfam in ('se', 'matern32', 'matern52'):
  if left() < 15 * 60:
    log(f'deadline guard: skipping {kfam} timing')
    break
  log(f'compiling {kfam} fused scan...')
  f = fused_scan(kfam)
  float(f(xs, y))
  t = timed_scalar(f, xs, y)
  results[f'{kfam}_ms_per_iter'] = t / K * 1e3
  log(f'{kfam}: {t / K * 1e3:.2f} ms/iter')

# Value agreement vs the XLA dense pipeline (bf16-noise tolerance).
# warp_func=None keeps the params raw so they match the fused calls
# (lengthscale 0.5, sv 1.0) exactly.
params = defs.GPParams(model={
    'lengthscale': jnp.ones(D) * 0.5, 'signal_variance': 1.0,
    'noise_variance': 0.1})


def fused_nll(kfam, n):
  @jax.jit
  def f(xs, y):
    quad, ld = pallas_mll.mll_fused_g(
        xs, y, 1.0, 0.1 + 0.1, block=256, half=512, group=2,
        sweep_unroll=32, kfam=kfam)
    return 0.5 * quad + ld + 0.5 * n * jnp.log(2 * jnp.pi)
  return f


for kfam, cov in (('matern32', kernel_lib.matern32),
                  ('matern52', kernel_lib.matern52)):
  if left() < 12 * 60:
    log(f'deadline guard: skipping {kfam} value check')
    break
  # The fused value check uses da=0.2; cov() carries no noise term, so
  # the dense side adds the same 0.2 explicitly.
  @jax.jit
  def dense_f(x, y, cov=cov):
    kmat = cov(params, x, warp_func=None)
    kmat = kmat + jnp.eye(x.shape[0]) * 0.2
    chol = chol_ops.cholesky(kmat)
    kinvy = chol_ops.cho_solve(chol, y)
    return (0.5 * jnp.sum(y * kinvy)
            + jnp.sum(jnp.log(jnp.diagonal(chol)))
            + 0.5 * x.shape[0] * jnp.log(2 * jnp.pi))
  want = float(dense_f(x, y))
  got = float(fused_nll(kfam, N)(xs, y))
  rel = abs(got - want) / abs(want)
  results[f'{kfam}_value_rel'] = rel
  log(f'{kfam} value: dense {want:.3f} fused {got:.3f} rel {rel:.2e}')

# Ragged n=8000 (masked kernel pads to 8192).
if left() > 12 * 60:
  n_r = 8000
  xr = x[:n_r]
  yr = y[:n_r]

  @jax.jit
  def ragged_fused(xr, yr):
    return pallas_mll.se_nll_fused_masked(
        xr / 0.5, yr, 1.0, 0.2, n_r, block=256, half=512, group=2,
        sweep_unroll=32, kfam='se')

  @jax.jit
  def ragged_dense(xr, yr):
    kmat = kernel_lib.squared_exponential(
        params, xr, warp_func=None)
    kmat = kmat + jnp.eye(n_r) * 0.2
    chol = chol_ops.cholesky(kmat)
    kinvy = chol_ops.cho_solve(chol, yr)
    return (0.5 * jnp.sum(yr * kinvy)
            + jnp.sum(jnp.log(jnp.diagonal(chol)))
            + 0.5 * n_r * jnp.log(2 * jnp.pi))

  want = float(ragged_dense(xr, yr))
  got = float(ragged_fused(xr, yr))
  rel = abs(got - want) / abs(want)
  results['ragged8000_value_rel'] = rel
  t = timed_scalar(ragged_fused, xr, yr)
  results['ragged8000_ms'] = t * 1e3
  log(f'ragged n=8000: dense {want:.3f} fused {got:.3f} rel {rel:.2e}; '
      f'{t * 1e3:.1f} ms (one-shot incl dispatch)')
else:
  log('deadline guard: skipping ragged leg')

# matern52 train leg: value_and_grad through the custom VJP.
if left() > 12 * 60:
  core = pallas_mll._se_nll_core_fn(256, 512, 2, False, 32, 'matern52')

  @jax.jit
  def step(xs, y):
    def loss(sv):
      def one(carry, bump):
        return carry + core(xs, y, sv, 0.1 + bump), ()
      tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, 8))
      return tot
    v, g = jax.value_and_grad(loss)(1.0)
    return v + g

  float(step(xs, y))
  t = timed_scalar(step, xs, y)
  results['matern52_vjp_ms_per_step'] = t / 8 * 1e3
  log(f'matern52 value_and_grad: {t / 8 * 1e3:.1f} ms/step')
else:
  log('deadline guard: skipping train leg')

log('RESULTS ' + json.dumps(results))
log('MATERN_PROBE_DONE')
