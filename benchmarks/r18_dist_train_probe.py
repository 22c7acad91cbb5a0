"""Round-18: distributed-trainer hardware validation + backward dissection.

Legs (all mesh(1) — the only real-TPU mesh this container reaches):
  1. fit_adam_large_sharded, n=8192 SE d=4: cached s/step of the full
     multi-chip pre-training loop (Adam over the distributed fused NLL)
     and value parity of the step-0 loss vs the single-chip fused NLL.
  2. Dissection of the r17-recorded ~99.7 ms distributed VG: forward
     alone, forward-with-residuals, and VG, to split the backward's
     LAUUM/tri-inv cost from the forward.
  3. n=16384 mesh(1) VG of the distributed route (first number at that
     size for the distributed path).

Run: nohup python benchmarks/r18_dist_train_probe.py > /tmp/r18p.log 2>&1 &
Verdict JSON: /tmp/r18p_verdict.json
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
  with open('/tmp/r18p_verdict.json', 'w') as f:
    json.dump(OUT, f, indent=1, default=str)


from benchmarks._transport import make_abort

_abort = make_abort(log)


def main():
  import jax
  import jax.numpy as jnp
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

  import numpy as np
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

  # ---- leg 1: the full trainer at n=8192 ----
  n = 8192
  x, y, model = problem(n)
  config = {'learning_rate': 1e-2, 'max_training_step': 8}
  try:
    t0 = time.time()
    trained, losses = large.fit_adam_large_sharded(
        mean.constant, kernel.squared_exponential, model, x, y, config,
        mesh, warp_func=DEFAULT_WARP_FUNC, route='fused',
        backend='pallas')
    losses = jax.device_get(losses)
    t_first = time.time() - t0
    t0 = time.time()
    _, losses2 = large.fit_adam_large_sharded(
        mean.constant, kernel.squared_exponential, model, x, y, config,
        mesh, warp_func=DEFAULT_WARP_FUNC, route='fused',
        backend='pallas')
    losses2 = jax.device_get(losses2)
    t_cached = time.time() - t0
    # Single-chip fused NLL value at the same params for step-0 parity.
    from hyperbo_tpu.models import objectives as obj
    p0 = defs.GPParams(model=model,
                       config={'fused_mll': True,
                               'ridge_epsilon': 1e-6})
    dataset = {'t': defs.SubDataset(x, y)}
    want0 = float(obj.neg_log_marginal_likelihood(
        mean.constant, kernel.squared_exponential, p0, dataset,
        warp_func=DEFAULT_WARP_FUNC))
    rel0 = abs(float(losses[0]) - want0) / max(1.0, abs(want0))
    OUT['trainer_8192'] = {
        'steps': 8, 'first_s': t_first, 'cached_s': t_cached,
        'cached_s_per_step': t_cached / 8,
        'loss0': float(losses[0]), 'lossN': float(losses[-1]),
        'singlechip_fused_nll0': want0, 'step0_rel': rel0,
        'monotone_start': bool(losses[-1] < losses[0]),
        'runs_match': bool(np.allclose(losses, losses2)),
    }
    log(f'trainer n=8192: first {t_first:.1f}s, cached '
        f'{t_cached / 8 * 1e3:.1f} ms/step, loss {losses[0]:.2f} -> '
        f'{losses[-1]:.2f}, step0 rel vs single-chip fused {rel0:.2e}')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'trainer_8192')
    OUT['trainer_8192'] = {'error': f'{type(e).__name__}: {e}'}
    log('trainer_8192 FAILED:', type(e).__name__, e)
  save()

  # ---- leg 2: VG dissection at n=8192 ----
  lmodel = {k: jnp.asarray(v) for k, v in model.items()}

  def dist_nll(m_):
    p = defs.GPParams(model=m_)
    return large.mll_distributed_fused(
        mean.constant, kernel.squared_exponential, p, x, y, mesh,
        warp_func=DEFAULT_WARP_FUNC, backend='pallas')

  try:
    f_plain = jax.jit(dist_nll)
    vg = jax.jit(jax.value_and_grad(dist_nll))
    for tag, fn in (('fwd_plain', f_plain), ('vg', vg)):
      fn(lmodel)  # compile
      ts = []
      for _ in range(4):
        t, _ = timed(fn, lmodel)
        ts.append(t)
      best = min(ts) * 1e3
      OUT[f'dissect_8192_{tag}_ms'] = best
      log(f'n=8192 {tag}: {best:.1f} ms (min of 4)')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'dissect_8192')
    log('dissect_8192 FAILED:', type(e).__name__, e)
  save()

  # ---- leg 3: n=16384 mesh(1) VG ----
  try:
    n2 = 16384
    x2, y2, model2 = problem(n2, seed=5)

    def dist2(m_):
      p = defs.GPParams(model=m_)
      return large.mll_distributed_fused(
          mean.constant, kernel.squared_exponential, p, x2, y2, mesh,
          warp_func=DEFAULT_WARP_FUNC, backend='pallas')

    vg2 = jax.jit(jax.value_and_grad(dist2))
    vg2(model2)
    ts = []
    for _ in range(3):
      t, _ = timed(vg2, model2)
      ts.append(t)
    OUT['dist_vg_16384_ms'] = min(ts) * 1e3
    log(f'n=16384 distributed VG: {min(ts) * 1e3:.1f} ms (min of 3)')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'vg_16384')
    OUT['dist_vg_16384'] = {'error': f'{type(e).__name__}: {e}'}
    log('vg_16384 FAILED:', type(e).__name__, e)
  save()
  log('DONE')


if __name__ == '__main__':
  main()
