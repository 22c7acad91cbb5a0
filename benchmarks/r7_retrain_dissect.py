"""Round-7: in-scan retraining cost dissection (verdict weak #3).

r5_bo_probe measured the retrain-every-5 loop at 1626 ms/iter and
HGP-resample at 1825 ms/iter, ~1000x the measured 0.25 ms packed Adam
step — with no per-phase breakdown. This probe isolates, on hardware:

  1. ONE jitted grad step of the corpus loss (the thing retrain() runs
     10x per event) — scan of 10 for amortization;
  2. the masked refactor alone (scan of 10);
  3. the full retrain loop, winv solver (new default) — the headline;
  4. the full retrain loop with retrain_steps=0 (cond present, never
     taken) — isolates the cond/scan overhead from the retrain body.

Cost model: per-iter = base_loop + (10 x grad + refactor) / 5.

Run: nohup python benchmarks/r7_retrain_dissect.py > /tmp/r7retrain.log 2>&1 &
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
  import optax
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

  n_max = 100
  loss_fn = ondevice._make_corpus_loss(
      mean.constant, kernel.squared_exponential, config,
      DEFAULT_WARP_FUNC, n_max, pretrain_packed=pp)
  x_buf = jax.random.uniform(jax.random.PRNGKey(3), (n_max, d))
  y_buf = jax.random.normal(jax.random.PRNGKey(4), (n_max, 1))
  count = jnp.array(n_max, jnp.int32)
  optimizer = optax.adam(1e-2)

  def timed(tag, fn, k, reps=2):
    try:
      t0 = time.perf_counter()
      s = fn()
      t_first = time.perf_counter() - t0
      best = None
      for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
      log(f'{tag}: {best*1e3:.3f} ms/unit cached '
          f'({t_first:.1f}s first incl. compile); readback {s:.4g}')
      return best
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)
      return None

  # ---- leg 1: grad steps of the corpus loss ----
  @jax.jit
  def grad_steps(model, x_buf, y_buf):
    opt_state = optimizer.init(model)

    def one(carry, _):
      m, o = carry
      grads = jax.grad(loss_fn)(m, x_buf, y_buf, count)
      updates, o = optimizer.update(grads, o)
      return (optax.apply_updates(m, updates), o), ()
    (m, _), _ = jax.lax.scan(one, (model, opt_state), None, length=10)
    return sum(jnp.sum(v) for v in jax.tree.leaves(m))

  timed('corpus-loss grad step (x10 scan)',
        lambda: float(grad_steps(model, x_buf, y_buf)), k=10)

  # ---- leg 1b: loss forward only ----
  @jax.jit
  def loss_fwd(model, x_buf, y_buf):
    def one(c, _):
      return c + loss_fn(model, x_buf, y_buf, count), ()
    tot, _ = jax.lax.scan(one, 0.0, None, length=10)
    return tot

  timed('corpus-loss forward (x10 scan)',
        lambda: float(loss_fwd(model, x_buf, y_buf)), k=10)

  # ---- leg 2: masked refactor ----
  @jax.jit
  def refactors(model, x_buf):
    def one(c, _):
      f = ondevice._masked_refactor(
          mean.constant, kernel.squared_exponential, config,
          DEFAULT_WARP_FUNC, model, x_buf, count)
      return c + jnp.sum(f), ()
    tot, _ = jax.lax.scan(one, 0.0, None, length=10)
    return tot

  timed('masked refactor (x10 scan)',
        lambda: float(refactors(model, x_buf)), k=10)

  # ---- legs 3+4: the full retrain loop ----
  for steps, tag in ((10, 'retrain every 5 x 10 steps'),
                     (0, 'retrain_steps=0 control')):
    timed(f'{tag} [winv]', lambda s=steps: float(jnp.sum(
        ondevice.simulated_bayesopt_ondevice_retrain(
            mean.constant, kernel.squared_exponential, model, config,
            DEFAULT_WARP_FUNC, queried, iters=iters, acquisition='ei',
            num_train_tasks=23, pretrain_packed=pp, retrain_every=5,
            retrain_steps=s)[1])), k=iters)

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
