"""Round-18b: mesh(1) VG re-measure after the triangular LAUUM rewrite
+ honest steady-state trainer rate (jit-once protocol).

r18 baseline (pre-rewrite): n=8192 fwd 35.5 ms / VG 188.1 ms;
n=16384 VG 511.8 ms; trainer "cached" 2872 ms/step was the
fresh-jit-per-call retrace of fit_adam_scan, not device time.

Legs:
  1. n=8192 distributed fwd + VG (min of 4) — the LAUUM rewrite's
     num==1 blocked SYRK should cut the backward's dominant GEMM 2x.
  2. n=16384 VG (min of 3).
  3. Steady-state trainer rate: ONE jitted 8-step scan (the same
     program fit_adam_scan builds), compiled once, min-of-2 timed
     re-calls -> ms/step.
  4. Backward dissection primitives: full (8192^2) HIGHEST GEMM A^T A
     vs the blocked-SYRK variant, to pin the LAUUM share.

Run: nohup python benchmarks/r18b_lauum_probe.py > /tmp/r18b.log 2>&1 &
Verdict JSON: /tmp/r18b_verdict.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()
OUT = {}


def log(*a):
  print(f'[{time.time() - T0:7.1f}s]', *a, file=sys.stderr, flush=True)


def save():
  with open('/tmp/r18b_verdict.json', 'w') as f:
    json.dump(OUT, f, indent=1, default=str)


from benchmarks._transport import make_abort

_abort = make_abort(log)


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax
  from jax.sharding import Mesh
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel, mean
  from hyperbo_tpu.parallel import large
  from hyperbo_tpu.utils.profiling import timed

  log('devices:', jax.devices())
  try:
    log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'warmup')
    raise

  mesh = Mesh(np.array(jax.devices()[:1]), ('task',))
  d = 4

  def problem(n, seed=0):
    x = jax.random.uniform(jax.random.PRNGKey(seed), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 1),
                          jnp.float32)
    model = {'constant': jnp.float32(0.3),
             'lengthscale': jnp.ones(d, jnp.float32) * 0.4,
             'signal_variance': jnp.float32(0.2),
             'noise_variance': jnp.float32(-2.0)}
    return x, y, model

  def dist_fn(x, y):
    def f(m_):
      p = defs.GPParams(model=m_)
      return large.mll_distributed_fused(
          mean.constant, kernel.squared_exponential, p, x, y, mesh,
          warp_func=DEFAULT_WARP_FUNC, backend='pallas')
    return f

  # ---- leg 1+2: VG re-measure ----
  for n, reps in ((8192, 4), (16384, 3)):
    try:
      x, y, model = problem(n)
      f = dist_fn(x, y)
      for tag, fn in (('fwd', jax.jit(f)),
                      ('vg', jax.jit(jax.value_and_grad(f)))):
        fn(model)
        ts = [timed(fn, model)[0] for _ in range(reps)]
        OUT[f'n{n}_{tag}_ms'] = min(ts) * 1e3
        log(f'n={n} {tag}: {min(ts) * 1e3:.1f} ms (min of {reps})')
    except Exception as e:  # noqa: BLE001
      _abort(e, f'vg_{n}')
      OUT[f'n{n}_error'] = f'{type(e).__name__}: {e}'
      log(f'n={n} FAILED:', type(e).__name__, e)
    save()

  # ---- leg 3: steady-state trainer rate (jit once, scan 8 steps) ----
  try:
    n = 8192
    x, y, model = problem(n)
    loss_fn = large.make_large_loss_sharded(
        mean.constant, kernel.squared_exponential, {}, mesh,
        warp_func=DEFAULT_WARP_FUNC, backend='pallas')
    opt = optax.adam(1e-2)

    @jax.jit
    def run8(model, x, y):
      def step(carry, _):
        mo, st = carry
        loss, g = jax.value_and_grad(loss_fn)(mo, (x, y))
        upd, st = opt.update(g, st)
        return (optax.apply_updates(mo, upd), st), loss
      (mo, _), losses = jax.lax.scan(step, (model, opt.init(model)),
                                     None, length=8)
      return losses

    run8(model, x, y)
    ts = [timed(run8, model, x, y)[0] for _ in range(2)]
    OUT['trainer_steady_ms_per_step'] = min(ts) / 8 * 1e3
    log(f'trainer steady-state: {min(ts) / 8 * 1e3:.1f} ms/step '
        f'(jit-once 8-step scan, min of 2)')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'trainer_steady')
    log('trainer_steady FAILED:', type(e).__name__, e)
  save()

  # ---- leg 4: LAUUM primitive A/B ----
  try:
    n = 8192
    t = jnp.tril(jax.random.normal(jax.random.PRNGKey(7), (n, n),
                                   jnp.float32))
    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def full_gemm(t):
      return jnp.matmul(t.T, t, precision=hi)

    from hyperbo_tpu.ops.pallas_mll import _kinv_from_linv

    @jax.jit
    def syrk(t):
      return _kinv_from_linv(t, hi, mode='syrk')

    for tag, fn in (('full_gemm', full_gemm), ('syrk', syrk)):
      fn(t)
      ts = [timed(fn, t)[0] for _ in range(3)]
      OUT[f'lauum_{tag}_ms'] = min(ts) * 1e3
      log(f'LAUUM {tag} (n=8192): {min(ts) * 1e3:.1f} ms (min of 3)')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'lauum_ab')
    log('lauum_ab FAILED:', type(e).__name__, e)
  save()
  log('DONE')


if __name__ == '__main__':
  main()
