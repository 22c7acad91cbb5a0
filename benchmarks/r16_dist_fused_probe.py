"""Round-16: local-rate A/B of the two distributed-MLL designs.

parallel/large.mll_distributed (row-sharded Gram + 256-block-cyclic
XLA Cholesky) vs parallel/large.mll_distributed_fused (coarse-block
loop whose shard-local compute is the Pallas kernel suite). On a
1-device mesh the collectives are free, so the A/B isolates exactly
what multi-chip scaling multiplies: the per-shard LOCAL compute rate.
(Real multi-chip hardware is unavailable here; the collective layer is
CPU-mesh- and dryrun-validated.)

Legs: n=8192 and n=16384, both designs, + NLL cross-parity.
Writes /tmp/r16_verdict.json.

Run: nohup python benchmarks/r16_dist_fused_probe.py > /tmp/r16probe.log 2>&1 &
"""

import json
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

VERDICT_PATH = os.environ.get('R16_VERDICT', '/tmp/r16_verdict.json')


def main():
  import jax
  import jax.numpy as jnp
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel, mean
  from hyperbo_tpu.parallel import large
  from hyperbo_tpu.parallel import mesh as mesh_lib

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  results = {}
  wf = DEFAULT_WARP_FUNC
  mesh = mesh_lib.create_mesh(1)

  def timeit(tag, fn, *args, reps=3):
    try:
      out = fn(*args)
      s = float(out)
      best = None
      for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
      log(f'{tag}: {best*1e3:.2f} ms (nll {s:.6g})')
      results[tag] = {'ms': best * 1e3, 'nll': s}
      return s
    except Exception as e:  # noqa: BLE001
      log(f'{tag}: FAILED {type(e).__name__}: {str(e)[:300]}')
      _abort_if_terminal_down(e, tag)
      results[tag] = None
      return None

  for n in (8192, 16384):
    d = 8
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, d), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (n, 1), jnp.float32)
    params = defs.GPParams(model={
        'constant': 0.1, 'lengthscale': jnp.ones(d) * 0.9,
        'signal_variance': 0.3, 'noise_variance': -2.0})

    cyclic = jax.jit(lambda x, y: large.mll_distributed(
        mean.constant, kernel.squared_exponential, params, x, y, mesh,
        warp_func=wf, block=256))
    fused = jax.jit(lambda x, y: large.mll_distributed_fused(
        mean.constant, kernel.squared_exponential, params, x, y, mesh,
        warp_func=wf, backend='pallas', interpret=False))

    a = timeit(f'block-cyclic-xla n={n}', cyclic, x, y)
    b = timeit(f'coarse-fused n={n}', fused, x, y)
    if a is not None and b is not None:
      rel = abs(a - b) / max(abs(a), 1e-30)
      log(f'parity n={n}: rel {rel:.3e}')
      results[f'parity_rel_n{n}'] = rel

  with open(VERDICT_PATH, 'w') as f:
    json.dump({'results': results}, f, indent=1)
  log(f'VERDICT at {VERDICT_PATH}')


if __name__ == '__main__':
  try:
    main()
  except SystemExit:
    raise
  except Exception as e:  # noqa: BLE001
    log(f'FATAL (caught to avoid wedging the tunnel): '
        f'{type(e).__name__}: {str(e)[:400]}')
    sys.exit(1)
