"""Round-18d: distributed-backward precision vs GROUND-TRUTH gradient.

r18c measured 'high' (3-pass) deviating from 'highest' (6-pass) by
4.3e-3 (n=8192) / 1.2e-2 (n=16384) on the signal_variance leaf — but
deviation-from-highest is not error. The shipping single-chip fused
backward itself deviates 4.25e-3 from the dense XLA-HIGHEST gradient
(bench parity leg). This probe compares ALL routes against the dense
XLA-HIGHEST gradient at the same (x, y, params):

  a. single-chip fused backward (library TPU default),
  b. distributed mesh(1) backward, prec=highest,
  c. distributed mesh(1) backward, prec=high.

Decision rule: flip HYPERBO_DIST_BWD_PREC default to 'high' iff (c)'s
worst-leaf error class is within ~1.5x of (b)'s AND no worse than
(a)'s — i.e. 'high' adds no error beyond what the library already
ships elsewhere.

Run: nohup python benchmarks/r18d_prec_accuracy_probe.py > /tmp/r18d.log 2>&1 &
Verdict JSON: /tmp/r18d_verdict.json
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
  with open('/tmp/r18d_verdict.json', 'w') as f:
    json.dump(OUT, f, indent=1, default=str)


from benchmarks._transport import make_abort

_abort = make_abort(log)


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np
  from jax.sharding import Mesh
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC, retrieve_params
  from hyperbo_tpu.models import kernel, mean, objectives as obj
  from hyperbo_tpu.parallel import large

  log('devices:', jax.devices())
  try:
    log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')
  except Exception as e:  # noqa: BLE001
    _abort(e, 'warmup')
    raise

  mesh = Mesh(np.array(jax.devices()[:1]), ('task',))
  d = 4

  for n in (8192, 16384):
    x = jax.random.uniform(jax.random.PRNGKey(0), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (n, 1), jnp.float32)
    model = {'constant': jnp.float32(0.3),
             'lengthscale': jnp.ones(d, jnp.float32) * 0.4,
             'signal_variance': jnp.float32(0.2),
             'noise_variance': jnp.float32(-2.0)}

    def dense_nll(m_):
      p = defs.GPParams(model=m_)
      nv, = retrieve_params(p, ['noise_variance'],
                            warp_func=DEFAULT_WARP_FUNC)
      km = kernel.squared_exponential(p, x, warp_func=DEFAULT_WARP_FUNC)
      km = km + (jnp.squeeze(nv) + 1e-6) * jnp.eye(n)
      delta = y - jnp.atleast_2d(
          mean.constant(p, x, warp_func=DEFAULT_WARP_FUNC))
      l = jnp.linalg.cholesky(km)
      kiy = jax.scipy.linalg.cho_solve((l, True), delta)
      return (0.5 * jnp.sum(delta * kiy)
              + jnp.sum(jnp.log(jnp.diagonal(l)))
              + 0.5 * n * jnp.log(2 * jnp.pi))

    def fused_nll(m_):
      p = defs.GPParams(model=m_, config={'fused_mll': True,
                                          'ridge_epsilon': 1e-6})
      return obj.neg_log_marginal_likelihood(
          mean.constant, kernel.squared_exponential, p,
          {'t': defs.SubDataset(x, y)}, warp_func=DEFAULT_WARP_FUNC)

    def dist_nll(m_):
      p = defs.GPParams(model=m_)
      return large.mll_distributed_fused(
          mean.constant, kernel.squared_exponential, p, x, y, mesh,
          warp_func=DEFAULT_WARP_FUNC, backend='pallas')

    grads = {}
    try:
      with jax.default_matmul_precision('highest'):
        grads['dense'] = jax.device_get(
            jax.jit(jax.grad(dense_nll))(model))
      log(f'n={n} dense XLA-HIGHEST gradient computed')
      grads['fused_singlechip'] = jax.device_get(
          jax.jit(jax.grad(fused_nll))(model))
      for prec in ('highest', 'high'):
        os.environ['HYPERBO_DIST_BWD_PREC'] = prec
        grads[f'dist_{prec}'] = jax.device_get(
            jax.jit(jax.grad(dist_nll))(model))
      os.environ['HYPERBO_DIST_BWD_PREC'] = 'highest'
    except Exception as e:  # noqa: BLE001
      _abort(e, f'grads_{n}')
      OUT[f'n{n}_error'] = f'{type(e).__name__}: {e}'
      log(f'n={n} FAILED:', type(e).__name__, e)
      save()
      continue

    res = {}
    for tag in ('fused_singlechip', 'dist_highest', 'dist_high'):
      rels = {}
      for k2 in grads['dense']:
        a = np.asarray(grads['dense'][k2])
        b = np.asarray(grads[tag][k2])
        rels[k2] = float(np.max(np.abs(a - b))
                         / (np.max(np.abs(a)) + 1e-12))
      res[tag] = rels
      log(f'n={n} {tag} vs dense: worst '
          f'{max(rels, key=rels.get)}={max(rels.values()):.2e} | '
          + ', '.join(f'{k2}={v:.1e}' for k2, v in rels.items()))
    OUT[f'n{n}'] = res
    save()
  log('DONE')


if __name__ == '__main__':
  main()
