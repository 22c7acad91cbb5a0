"""Round-17c: HGP-resample BO A/B + per-eval cost dissection.

Follow-up to r17_session (its hgp_bo_ab leg died on an argument-order
typo). Also answers the open question the r17 trip stats raised: with
~86 serial log-prob evals per sweep and a ~163 ms chain advance, one
batched (S=8) corpus-loss eval costs ~1.9 ms — ~8x a full PD1 packed
value_and_grad step. Leg 2 times the eval AMORTIZED (100 chained evals
in one program, no tunnel RTT) and splits it into its corpus-NLL vs
test-buffer-NLL components.

Run: nohup python benchmarks/r17c_hgp_ab.py > /tmp/r17c.log 2>&1 &
Verdict JSON: /tmp/r17c_verdict.json
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
  with open('/tmp/r17c_verdict.json', 'w') as f:
    json.dump(OUT, f, indent=1, default=str)


from benchmarks._transport import make_abort

_abort_if_terminal_down = make_abort(log)


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np
  from jax import flatten_util
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
  S = 8

  def bo_run():
    return ondevice.simulated_bayesopt_ondevice_hgp_resample(
        mean.constant, kernel.squared_exponential, model, config,
        DEFAULT_WARP_FUNC, queried, iters=iters, acquisition='ei',
        num_samples=S, num_train_tasks=23, pretrain_packed=pp,
        resample_every=5, sweeps=1, key=jax.random.PRNGKey(2))

  def bo_rate(tag):
    t0 = time.time()
    s = float(jnp.sum(bo_run()[1]))
    t_first = time.time() - t0
    times = []
    for _i in range(3):
      t0 = time.perf_counter()
      float(jnp.sum(bo_run()[1]))
      times.append((time.perf_counter() - t0) / iters)
    log(f'{tag}: {min(times)*1e3:.2f} ms/iter '
        f'[{", ".join(f"{t*1e3:.2f}" for t in times)}] '
        f'(first {t_first:.1f}s incl compile; readback {s:.4g})')
    return {'ms_per_iter': min(times) * 1e3,
            'times_ms': [t * 1e3 for t in times]}

  try:
    os.environ['HYPERBO_SLICE_STEPOUT'] = 'serial'
    ondevice._BO_RUNNER_CACHE.clear()
    OUT['bo_serial'] = bo_rate('HGP-resample BO (serial stepout)')
    sel_serial = np.asarray(bo_run()[2])
    os.environ['HYPERBO_SLICE_STEPOUT'] = 'fused'
    ondevice._BO_RUNNER_CACHE.clear()
    OUT['bo_fused'] = bo_rate('HGP-resample BO (fused stepout)')
    sel_fused = np.asarray(bo_run()[2])
    OUT['selection_parity'] = bool((sel_serial == sel_fused).all())
    OUT['bo_speedup'] = (OUT['bo_serial']['ms_per_iter']
                         / OUT['bo_fused']['ms_per_iter'])
    log(f'A/B: {OUT["bo_speedup"]:.2f}x; selection parity '
        f'{OUT["selection_parity"]}')
  except Exception as e:  # noqa: BLE001
    log(f'bo_ab FAILED {type(e).__name__}: {str(e)[:300]}')
    OUT['bo_ab_error'] = f'{type(e).__name__}: {str(e)[:300]}'
    _abort_if_terminal_down(e, 'bo_ab')
  save()

  # ---- per-eval amortized dissection -------------------------------
  model0 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                        dict(model))
  x0_flat, unravel = flatten_util.ravel_pytree(model0)
  p_dim = x0_flat.shape[0]
  xs0 = x0_flat[None, :] + 0.1 * jax.random.normal(
      jax.random.fold_in(key, 7), (S, p_dim))
  n_max = iters + 8
  x_buf = jnp.zeros((n_max, d), jnp.float32).at[:10].set(qx[:10])
  y_buf = jnp.zeros((n_max, 1), jnp.float32).at[:10].set(qy[:10])
  count0 = jnp.array(10, jnp.int32)

  def make_scan100(loss_fn):
    @jax.jit
    def run(xs):
      def body(c, _):
        ll = jax.vmap(loss_fn)(c)
        # chain the result into the carry so the 100 evals are
        # sequentially dependent (like the sampler's serial rounds)
        return c + 1e-12 * ll[:, None], ll
      _, lls = jax.lax.scan(body, xs, None, length=100)
      return jnp.sum(lls)
    return run

  def lp_full(v):
    return -ondevice._corpus_loss(
        mean.constant, kernel.squared_exponential, config,
        DEFAULT_WARP_FUNC, n_max, unravel(v), x_buf, y_buf, count0,
        pretrain_packed=pp)

  def lp_corpus_only(v):
    return -ondevice._corpus_loss(
        mean.constant, kernel.squared_exponential, config,
        DEFAULT_WARP_FUNC, n_max, unravel(v), x_buf, y_buf,
        jnp.array(0, jnp.int32), pretrain_packed=pp)

  def lp_test_only(v):
    return -ondevice._corpus_loss(
        mean.constant, kernel.squared_exponential, config,
        DEFAULT_WARP_FUNC, n_max, unravel(v), x_buf, y_buf, count0,
        pretrain_packed=None)

  def timed_scan(tag, loss_fn):
    try:
      f = make_scan100(loss_fn)
      _ = float(f(xs0))
      times = []
      for _i in range(3):
        t0 = time.perf_counter()
        _ = float(f(xs0))
        times.append(time.perf_counter() - t0)
      per = min(times) * 10.0  # /100 evals, in ms
      log(f'{tag}: {per:.3f} ms/eval (amortized over 100 chained)')
      return per
    except Exception as e:  # noqa: BLE001
      log(f'{tag} FAILED {type(e).__name__}: {str(e)[:200]}')
      _abort_if_terminal_down(e, tag)
      return None

  OUT['eval_full_ms'] = timed_scan('corpus+test eval (S=8)', lp_full)
  OUT['eval_corpus_only_ms'] = timed_scan('corpus-only eval (S=8)',
                                          lp_corpus_only)
  OUT['eval_test_only_ms'] = timed_scan('test-buffer-only eval (S=8)',
                                        lp_test_only)
  save()
  log('DONE')


if __name__ == '__main__':
  main()
