"""Round-18e: n=16384 distributed trainer steady-state at the shipped
('high'-precision-backward) defaults — closes the mesh(1) ladder:
26.4 ms/step @ n=8192 (bench dist_train leg), this probe @ n=16384.

Run: nohup python benchmarks/r18e_trainer16k_probe.py > /tmp/r18e.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()


def log(*a):
  print(f'[{time.time() - T0:7.1f}s]', *a, file=sys.stderr, flush=True)


from benchmarks._transport import make_abort

_abort = make_abort(log)


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax
  from jax.sharding import Mesh
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel, mean
  from hyperbo_tpu.parallel import large
  from hyperbo_tpu.train.adam import _guarded_update

  log('devices:', jax.devices())
  try:
    log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'warmup')
    raise

  n, d, steps = 16384, 4, 8
  x = jax.random.uniform(jax.random.PRNGKey(0), (n, d), jnp.float32)
  y = jax.random.normal(jax.random.PRNGKey(1), (n, 1), jnp.float32)
  model = {'constant': jnp.float32(0.3),
           'lengthscale': jnp.ones(d, jnp.float32) * 0.4,
           'signal_variance': jnp.float32(0.2),
           'noise_variance': jnp.float32(-2.0)}
  mesh = Mesh(np.array(jax.devices()[:1]), ('task',))
  loss_fn = large.make_large_loss_sharded(
      mean.constant, kernel.squared_exponential, {}, mesh,
      warp_func=DEFAULT_WARP_FUNC)
  opt = optax.adam(1e-2)

  @jax.jit
  def run(model, x, y):
    def step(carry, _):
      mo, st, frozen = carry
      mo, st, frozen, loss = _guarded_update(
          opt, loss_fn, mo, st, frozen, (x, y))
      return (mo, st, frozen), loss
    _, losses = jax.lax.scan(
        step, (model, opt.init(model), jnp.array(False)), None,
        length=steps)
    return jnp.sum(losses)

  try:
    t0 = time.perf_counter()
    float(run(model, x, y))
    log(f'first call (compile + {steps} steps): '
        f'{time.perf_counter() - t0:.1f}s')
    ts = []
    for _ in range(2):
      t0 = time.perf_counter()
      float(run(model, x, y))
      ts.append((time.perf_counter() - t0) / steps)
    log(f'trainer n=16384 steady-state (shipped defaults): '
        f'{min(ts) * 1e3:.1f} ms/step (min of 2)')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'trainer16k')
    raise
  log('DONE')


if __name__ == '__main__':
  main()
