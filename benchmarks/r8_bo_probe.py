"""Round-8: cached-runner on-device BO rates on hardware.

r7 diagnosed the 38-1825 ms/iter BO numbers as host retrace paid on
every call (the loops rebuilt their jax.jit wrappers per invocation);
commit d1cb540 made every loop dispatch ONE memoized runner with the
model/corpus as traced arguments. Expected cached rates from the r7
dissection: plain ~0.6 ms/iter (posterior 0.28 + append 0.28),
retrain-every-5 ~8 ms/iter amortized (10 x 3.19 ms Adam + 3.0 ms
refactor per event).

Legs (first call = compile; the SECOND and THIRD calls are the
product-relevant number — a production sweep calls the loop hundreds
of times):
  1. plain scan BO 100 x 10k (ei);
  2. in-scan retraining (every 5, 10 Adam steps, 23-task corpus);
  3. HGP re-sampling (S=8, 1 sweep every 5, same corpus);
  4. q-batch kriging-believer (25 x q=4).

Run: nohup python benchmarks/r8_bo_probe.py > /tmp/r8bo.log 2>&1 &
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

_abort_if_terminal_down = make_abort(log)


def main():
  import jax
  import jax.numpy as jnp
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel, mean
  from hyperbo_tpu.models import packed as packed_lib
  from hyperbo_tpu.bo import ondevice

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  d, n_cand, iters = 4, 10000, 100
  key = jax.random.PRNGKey(0)
  qx = jax.random.uniform(key, (n_cand, d), jnp.float32)
  qy = jnp.sin(3 * qx @ jax.random.normal(
      jax.random.fold_in(key, 1), (d, 1)))
  queried = defs.SubDataset(qx, qy)
  model = {'constant': 0.0, 'lengthscale': jnp.zeros(d),
           'signal_variance': 0.0, 'noise_variance': -3.0}
  config = {'learning_rate': 1e-2}

  corpus = {}
  for i in range(23):
    k1, k2 = jax.random.split(jax.random.fold_in(key, 100 + i))
    cx = jax.random.uniform(k1, (100, d))
    corpus[i] = defs.SubDataset(
        cx, jnp.sin(3 * cx @ jax.random.normal(k2, (d, 1))))
  pp, _ = packed_lib.pack_dataset(corpus, pad_to_multiple=128)

  def timed(tag, fn, k, reps=3):
    try:
      t0 = time.perf_counter()
      s = fn()
      t_first = time.perf_counter() - t0
      times = []
      for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) / k)
      per = ', '.join(f'{t*1e3:.3f}' for t in times)
      log(f'{tag}: [{per}] ms/iter over {reps} repeat calls '
          f'({t_first:.1f}s first incl. compile); readback {s:.4g}')
      return min(times)
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)
      return None

  timed('plain scan BO 100x10k (ei)', lambda: float(jnp.sum(
      ondevice.simulated_bayesopt_ondevice(
          mean.constant, kernel.squared_exponential, model, config,
          DEFAULT_WARP_FUNC, queried, iters=iters, acquisition='ei',
          num_train_tasks=23)[1])), k=iters)

  timed('retrain BO (every 5, 10 steps)', lambda: float(jnp.sum(
      ondevice.simulated_bayesopt_ondevice_retrain(
          mean.constant, kernel.squared_exponential, model, config,
          DEFAULT_WARP_FUNC, queried, iters=iters, acquisition='ei',
          num_train_tasks=23, pretrain_packed=pp, retrain_every=5,
          retrain_steps=10)[1])), k=iters)

  timed('HGP resample BO (S=8, 1 sweep every 5)', lambda: float(jnp.sum(
      ondevice.simulated_bayesopt_ondevice_hgp_resample(
          mean.constant, kernel.squared_exponential, model, config,
          DEFAULT_WARP_FUNC, queried, iters=iters, acquisition='ei',
          num_samples=8, num_train_tasks=23, pretrain_packed=pp,
          resample_every=5, sweeps=1)[1])), k=iters)

  timed('q-batch BO (25 x q=4)', lambda: float(jnp.sum(
      ondevice.simulated_bayesopt_ondevice_qbatch(
          mean.constant, kernel.squared_exponential, model, config,
          DEFAULT_WARP_FUNC, queried, iters=25, q=4, acquisition='ei',
          num_train_tasks=23)[1])), k=100)

  log('DONE')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
