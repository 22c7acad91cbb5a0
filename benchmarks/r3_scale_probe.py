"""Hardware probe: n=32768 fused MLL + on-device BO loop timing.

One-process probe (tunnel admission paid once; CLAUDE.md wedge notes):

  1. X3-matmul peak at n=8192 (the normalization used by bench.py).
  2. n=32768 fused MLL (block=256, half=512, group=2): a new large-n
     point past the n=16384 leg. HBM: the panel-major L output is
     4 GiB f32 — fits the 16 GB chip with room; every VMEM scratch in
     the kernel is O(block)-sized (ops/pallas_mll.py:912-941).
  3. On-device BO loop (bo/ondevice.py, the scan over rank-1 appends +
     batched candidate scoring): ms per BO iteration at 10k and 100k
     candidates, 100 iterations, EI. This is the serving-path number —
     the reference host loop refactorizes O(n^3) per iteration and
     round-trips the host; ours is one compiled program.

Run:  nohup python benchmarks/r3_scale_probe.py > /tmp/scale_probe.log 2>&1 &
Never timeout-kill this process (wedges the tunnel); it deadlines itself.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()
DEADLINE_S = 90 * 60.0


def log(msg):
  print(f'[{time.time() - T0:8.1f}s] {msg}', flush=True)


def left():
  return DEADLINE_S - (time.time() - T0)


log('importing jax (tunnel admission may take many minutes)...')
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

log(f'devices: {jax.devices()}')
v = float(jnp.ones((64, 64)).sum())
log(f'admitted; warmup sum={v}')

from hyperbo_tpu.bo import ondevice  # noqa: E402
from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC  # noqa: E402
from hyperbo_tpu.models import kernel as kernel_lib  # noqa: E402
from hyperbo_tpu.models import mean as mean_lib  # noqa: E402
from hyperbo_tpu.ops import pallas_mll  # noqa: E402

results = {}


def timed_scalar(fn, *args, iters=2):
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    float(fn(*args))
    times.append(time.perf_counter() - t0)
  return min(times)


# --- 1. measured X3 matmul peak (normalization, as in bench.py) -------
N_MM, K_MM = 8192, 16
a = jax.random.normal(jax.random.PRNGKey(0), (N_MM, N_MM),
                      jnp.float32) / jnp.sqrt(jnp.float32(N_MM))
prec = lax.DotAlgorithmPreset.BF16_BF16_F32_X3


@jax.jit
def chain(a):
  def body(z, _):
    return jnp.dot(z, a, precision=prec), ()
  z, _ = lax.scan(body, a, None, length=K_MM)
  return jnp.sum(z[0])


float(chain(a))
t_mm = timed_scalar(chain, a)
mm_tflops = 2.0 * N_MM**3 * K_MM / t_mm / 1e12
results['x3_peak_tflops'] = mm_tflops
log(f'X3 matmul peak: {mm_tflops:.1f} TFLOP/s')

# --- 2. n=32768 fused MLL --------------------------------------------
if left() > 30 * 60:
  N2, D, K2 = 32768, 8, 4
  x2 = jax.random.uniform(jax.random.PRNGKey(1), (N2, D), jnp.float32)
  y2 = jax.random.normal(jax.random.PRNGKey(2), (N2, 1), jnp.float32)
  xs2 = x2 / 0.5

  @jax.jit
  def mll_xl(xs2, y2):
    def one(carry, bump):
      quad, ld = pallas_mll.mll_fused_g(
          xs2, y2, 1.0, 0.1 + bump, block=256, half=512, group=2,
          sweep_unroll=32)
      return carry + 0.5 * quad + ld, ()
    tot, _ = lax.scan(one, 0.0, jnp.linspace(0., 1e-3, K2))
    return tot

  log('compiling n=32768 fused MLL...')
  try:
    float(mll_xl(xs2, y2))
    t_xl = timed_scalar(mll_xl, xs2, y2)
    xl_flops = (2.0 * N2 * N2 * D + N2**3 / 3.0 + 2.0 * N2 * N2) * K2
    xl_frac = xl_flops / t_xl / 1e12 / mm_tflops
    results['n32768_ms_per_iter'] = t_xl / K2 * 1e3
    results['n32768_peak_fraction'] = xl_frac
    log(f'n=32768 fused MLL: {t_xl / K2 * 1e3:.1f} ms/iter = '
        f'{100 * xl_frac:.1f}% of peak')
  except Exception as e:  # noqa: BLE001
    log(f'n=32768 leg failed: {type(e).__name__}: {e}')
    results['n32768_error'] = f'{type(e).__name__}: {e}'
  del x2, y2, xs2
else:
  log('deadline guard: skipping n=32768 leg')

# --- 3. on-device BO loop timing -------------------------------------
# build_bo_step + one jitted scan (the public wrapper re-traces per
# call, so we drive the step builder directly for cached timing).
from hyperbo_tpu.ops import chol as chol_ops  # noqa: E402

D_BO, ITERS = 4, 100
model_params = {'constant': 0.0, 'lengthscale': jnp.zeros(D_BO),
                'signal_variance': 0.0, 'noise_variance': -4.0}

for n_c in (10_000, 100_000):
  if left() < 12 * 60:
    log(f'deadline guard: skipping BO n_c={n_c}')
    break
  cand_x = jax.random.uniform(jax.random.PRNGKey(3), (n_c, D_BO))
  w = jax.random.normal(jax.random.PRNGKey(4), (D_BO, 1))
  cand_y = jnp.sin(3 * cand_x @ w)
  n_max = ITERS + 8
  step = ondevice.build_bo_step(
      mean_lib.constant, kernel_lib.squared_exponential, model_params,
      {}, DEFAULT_WARP_FUNC, 'ei', n_max, num_train_tasks=5)

  @jax.jit
  def bo_run(cand_x, cand_y, key):
    state = (jnp.zeros((n_max, D_BO), jnp.float32),
             jnp.zeros((n_max, 1), jnp.float32),
             chol_ops.init_chol_buffer(n_max),
             jnp.array(0, jnp.int32))

    def body(state, k):
      return step(state, k, cand_x, cand_y)

    state, sel = lax.scan(body, state, jax.random.split(key, ITERS))
    return jnp.sum(state[1]) + jnp.sum(sel)

  log(f'compiling BO loop n_c={n_c}...')
  float(bo_run(cand_x, cand_y, jax.random.PRNGKey(5)))
  t_bo = timed_scalar(bo_run, cand_x, cand_y, jax.random.PRNGKey(6))
  results[f'bo_ms_per_iter_nc{n_c}'] = t_bo / ITERS * 1e3
  log(f'on-device BO n_c={n_c}: {t_bo / ITERS * 1e3:.2f} ms/iter '
      f'({ITERS} iters in {t_bo:.2f}s)')

log('RESULTS ' + json.dumps(results))
log('SCALE_PROBE_DONE')
