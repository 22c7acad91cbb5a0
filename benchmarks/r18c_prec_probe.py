"""Round-18c: clean-protocol mesh(1) VG numbers + backward precision A/B.

r18b uncovered a MEASUREMENT artifact in every distributed-VG number so
far: utils.profiling.timed forces a host readback PER OUTPUT LEAF, and
through the axon tunnel each readback costs ~26 ms RTT — a
value_and_grad's 6 leaves carry ~150 ms of RTT, while the 8-step
trainer scan (one losses leaf) showed the true step cost is ~35 ms.
This probe re-measures with the output reduced to ONE scalar INSIDE
the jitted program (single readback), and A/Bs the backward GEMM
precision (HYPERBO_DIST_BWD_PREC=highest vs high — the latter is the
same 3-pass accuracy class as the single-chip Pallas X3 dots).

Run: nohup python benchmarks/r18c_prec_probe.py > /tmp/r18c.log 2>&1 &
Verdict JSON: /tmp/r18c_verdict.json
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
  with open('/tmp/r18c_verdict.json', 'w') as f:
    json.dump(OUT, f, indent=1, default=str)


from benchmarks._transport import make_abort

_abort = make_abort(log)


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np
  from jax.sharding import Mesh
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel, mean
  from hyperbo_tpu.parallel import large

  log('devices:', jax.devices())
  try:
    log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'warmup')
    raise

  mesh = Mesh(np.array(jax.devices()[:1]), ('task',))
  d = 4

  def t_scalar(fn, *args, reps=4):
    """Median wall time; fn returns ONE scalar (single readback)."""
    float(fn(*args))  # warmup (already compiled by caller, belt+braces)
    ts = []
    for _ in range(reps):
      t0 = time.perf_counter()
      float(fn(*args))
      ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]

  for n, reps in ((8192, 5), (16384, 3)):
    x = jax.random.uniform(jax.random.PRNGKey(0), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (n, 1), jnp.float32)
    model = {'constant': jnp.float32(0.3),
             'lengthscale': jnp.ones(d, jnp.float32) * 0.4,
             'signal_variance': jnp.float32(0.2),
             'noise_variance': jnp.float32(-2.0)}

    def dist(m_):
      p = defs.GPParams(model=m_)
      return large.mll_distributed_fused(
          mean.constant, kernel.squared_exponential, p, x, y, mesh,
          warp_func=DEFAULT_WARP_FUNC, backend='pallas')

    # forward, single scalar out
    try:
      fwd1 = jax.jit(dist)
      fwd1(model)
      t = t_scalar(fwd1, model, reps=reps)
      OUT[f'n{n}_fwd_ms'] = t * 1e3
      log(f'n={n} fwd (1-scalar): {t * 1e3:.1f} ms')
    except Exception as e:  # noqa: BLE001
      _abort(e, f'fwd_{n}')
      log(f'n={n} fwd FAILED:', type(e).__name__, e)
    save()

    grads = {}
    for prec in ('highest', 'high'):
      os.environ['HYPERBO_DIST_BWD_PREC'] = prec
      try:
        def vg_scalar(m_):
          v, g = jax.value_and_grad(dist)(m_)
          acc = v
          for leaf in jax.tree.leaves(g):
            acc = acc + jnp.sum(leaf)
          return acc

        vgj = jax.jit(vg_scalar)
        vgj(model)
        t = t_scalar(vgj, model, reps=reps)
        OUT[f'n{n}_vg_{prec}_ms'] = t * 1e3
        log(f'n={n} VG (1-scalar) prec={prec}: {t * 1e3:.1f} ms')
        grads[prec] = jax.device_get(
            jax.jit(jax.grad(dist))(model))
      except Exception as e:  # noqa: BLE001
        _abort(e, f'vg_{n}_{prec}')
        OUT[f'n{n}_vg_{prec}'] = f'{type(e).__name__}: {e}'
        log(f'n={n} prec={prec} FAILED:', type(e).__name__, e)
      save()
    if 'highest' in grads and 'high' in grads:
      rels = {}
      for k2 in grads['highest']:
        a = np.asarray(grads['highest'][k2])
        b = np.asarray(grads['high'][k2])
        rels[k2] = float(np.max(np.abs(a - b))
                         / (np.max(np.abs(a)) + 1e-12))
      OUT[f'n{n}_high_vs_highest_rel'] = rels
      log(f'n={n} grad deviation high-vs-highest: '
          + ', '.join(f'{k2}={v:.1e}' for k2, v in rels.items()))
    save()
    os.environ['HYPERBO_DIST_BWD_PREC'] = 'highest'

  # trainer steady-state at n=16384 (scan-8, one losses leaf)
  try:
    import optax
    n = 16384
    x = jax.random.uniform(jax.random.PRNGKey(0), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (n, 1), jnp.float32)
    model = {'constant': jnp.float32(0.3),
             'lengthscale': jnp.ones(d, jnp.float32) * 0.4,
             'signal_variance': jnp.float32(0.2),
             'noise_variance': jnp.float32(-2.0)}
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
      return jnp.sum(losses)

    run8(model, x, y)
    t = t_scalar(run8, model, x, y, reps=2)
    OUT['trainer16384_steady_ms_per_step'] = t / 8 * 1e3
    log(f'trainer n=16384 steady-state: {t / 8 * 1e3:.1f} ms/step')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'trainer16384')
    log('trainer16384 FAILED:', type(e).__name__, e)
  save()
  log('DONE')


if __name__ == '__main__':
  main()
