"""Hardware probe: the round-5 on-device BO variants at production scale.

Legs (all one process, transport-abort discipline):
  1. plain scan BO, 100 iters x 10k candidates (round-3 baseline
     0.35 ms/iter — regression check);
  2. in-scan retraining: 100 iters, retrain every 5 x 10 Adam steps on
     a PD1-scale corpus (23 tasks x 100-pt subsample class);
  3. q-batch (q=4) at the same candidate scale;
  4. HGP re-sampling: S=8 chains, 1 sweep every 5 iters.

Run: nohup python benchmarks/r5_bo_probe.py > /tmp/r5bo.log 2>&1 &
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

  # PD1-scale retraining corpus: 23 tasks x 100 points (the subsample
  # class the batched-chol kernel serves).
  corpus = {}
  for i in range(23):
    k1, k2 = jax.random.split(jax.random.fold_in(key, 100 + i))
    cx = jax.random.uniform(k1, (100, d))
    corpus[i] = defs.SubDataset(
        cx, jnp.sin(3 * cx @ jax.random.normal(k2, (d, 1))))
  pp, _ = packed_lib.pack_dataset(corpus, pad_to_multiple=128)

  def timed(tag, fn):
    log(f'--- {tag} ...')
    try:
      t0 = time.perf_counter()
      out = fn()
      jax.block_until_ready(out)
      s = float(jnp.sum(out[1]))  # scalar readback forces completion
      t_first = time.perf_counter() - t0
      t0 = time.perf_counter()
      float(jnp.sum(fn()[1]))
      t = time.perf_counter() - t0
      log(f'{tag}: {t/iters*1e3:.3f} ms/iter cached '
          f'({t_first:.1f}s incl. compile); sum_y={s:.3f}')
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED: {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)

  timed('plain scan BO (100 x 10k, ei)', lambda: (
      ondevice.simulated_bayesopt_ondevice(
          mean.constant, kernel.squared_exponential, model, config,
          DEFAULT_WARP_FUNC, queried, iters=iters, acquisition='ei',
          num_train_tasks=23)[:2]))

  timed('in-scan retraining (every 5 x 10 steps, PD1 corpus)',
        lambda: ondevice.simulated_bayesopt_ondevice_retrain(
            mean.constant, kernel.squared_exponential, model, config,
            DEFAULT_WARP_FUNC, queried, iters=iters, acquisition='ei',
            num_train_tasks=23, pretrain_packed=pp, retrain_every=5,
            retrain_steps=10)[:2])

  timed('q-batch (25 x q=4)', lambda: (
      ondevice.simulated_bayesopt_ondevice_qbatch(
          mean.constant, kernel.squared_exponential, model, config,
          DEFAULT_WARP_FUNC, queried, iters=iters // 4, q=4,
          acquisition='ei', num_train_tasks=23)[:2]))

  timed('HGP re-sampling (S=8, 1 sweep every 5)', lambda: (
      ondevice.simulated_bayesopt_ondevice_hgp_resample(
          mean.constant, kernel.squared_exponential, model, config,
          DEFAULT_WARP_FUNC, queried, iters=iters, acquisition='ei',
          num_samples=8, num_train_tasks=23, pretrain_packed=pp,
          resample_every=5, sweeps=1)[:2]))

  log('DONE')


if __name__ == '__main__':
  main()
