"""Forward-export validation at n = 32768 (closing an evidence gap).

Every n=32768 gradient comparison so far (r14, r15, r17 leg 1) consumed
the SAME fused-forward L export — a 4 GiB panel-major tensor written by
the Pallas kernel, i.e. exactly the >= 2^31-byte offset class that
broke the backward SYRK kernel (PERF.md r14). If the export wrapped,
both sides of those comparisons would be wrong in common mode.

This probe checks the forward INDEPENDENTLY against a pure-XLA dense
pipeline (no Pallas anywhere, 64-bit-safe):
  1. NLL value: fused kernel vs dense K -> lax.linalg.cholesky ->
     triangular solve logdet/quad.
  2. L export: sampled 512x512 blocks of the fused dense-L export vs
     the XLA factor — corners chosen to hit the highest byte offsets
     of the panel-major write (last panel, last row block) where an
     int32 wrap would land.

Run: nohup python benchmarks/r17b_fwd32k_probe.py > /tmp/r17b.log 2>&1 &
Verdict JSON: /tmp/r17b_verdict.json
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


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np
  from hyperbo_tpu.ops import pallas_mll

  out = {}

  def save():
    with open('/tmp/r17b_verdict.json', 'w') as f:
      json.dump(out, f, indent=1, default=str)

  log('devices:', jax.devices())
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))})')

  n, d = 32768, 4
  key = jax.random.PRNGKey(0)
  x = jax.random.uniform(key, (n, d), jnp.float32) * 2.0
  delta = jnp.sin(3.0 * x @ jax.random.normal(
      jax.random.fold_in(key, 1), (d, 1)))
  sv, da = jnp.float32(1.2), jnp.float32(0.3)

  blocks = [(0, 0), (n - 512, 0), (n - 512, n - 1024),
            (n - 512, n - 512), (n // 2, n // 2 - 512)]

  try:
    @jax.jit
    def dense_ref(xv, dv):
      sq = jnp.sum(xv * xv, axis=1, keepdims=True)
      r2 = jnp.maximum(
          sq + sq.T - 2.0 * jnp.matmul(xv, xv.T,
                                       precision=jax.lax.Precision.HIGH),
          0.0)
      kmat = sv * jnp.exp(-0.5 * r2) + da * jnp.eye(n, dtype=jnp.float32)
      l = jax.lax.linalg.cholesky(kmat)
      z = jax.lax.linalg.triangular_solve(l, dv, left_side=True,
                                          lower=True)
      nll = (0.5 * jnp.sum(z * z)
             + jnp.sum(jnp.log(jnp.diagonal(l))))
      samp = jnp.stack([
          jax.lax.dynamic_slice(l, (r, c), (512, 512))
          for r, c in blocks])
      return nll, samp

    t0 = time.time()
    nll_x, samp_x = dense_ref(x, delta)
    nll_x = float(nll_x)
    samp_x = np.asarray(samp_x)
    log(f'dense XLA pipeline: nll_core {nll_x:.4f} '
        f'({time.time() - t0:.1f}s incl compile)')
    out['nll_dense'] = nll_x
  except Exception as e:  # noqa: BLE001
    log(f'dense reference FAILED: {type(e).__name__}: {str(e)[:300]}')
    out['dense_error'] = f'{type(e).__name__}: {str(e)[:300]}'
    save()
    _abort_if_terminal_down(e, 'dense_ref')
    return

  try:
    @jax.jit
    def fused_fwd(xv, dv):
      l, quad, ld = pallas_mll.mll_fused_g(
          xv, dv, sv, da, block=256, half=512, group=2,
          sweep_unroll=32, return_l=True, kfam='se',
          pivot_mode='octv', interpret=False)
      nll = 0.5 * quad + ld
      samp = jnp.stack([
          jax.lax.dynamic_slice(l, (r, c), (512, 512))
          for r, c in blocks])
      return nll, samp

    t0 = time.time()
    nll_f, samp_f = fused_fwd(x, delta)
    nll_f = float(nll_f)
    samp_f = np.asarray(samp_f)
    log(f'fused forward (return_l): nll_core {nll_f:.4f} '
        f'({time.time() - t0:.1f}s incl compile)')
    out['nll_fused'] = nll_f
    out['nll_rel'] = abs(nll_f - nll_x) / (abs(nll_x) + 1e-12)
    rels = []
    for bi, (r, c) in enumerate(blocks):
      aa, bb = samp_f[bi], samp_x[bi]
      rel = float(np.max(np.abs(aa - bb)) / (np.max(np.abs(bb)) + 1e-12))
      rels.append(rel)
      log(f'L block ({r},{c}): max rel {rel:.3e}')
    out['l_block_rels'] = rels
    out['l_export_ok'] = bool(max(rels) < 5e-3)
    out['nll_ok'] = bool(out['nll_rel'] < 1e-4)
    log(f'VERDICT: nll rel {out["nll_rel"]:.3e} '
        f'(ok={out["nll_ok"]}), L export max rel {max(rels):.3e} '
        f'(ok={out["l_export_ok"]})')
  except Exception as e:  # noqa: BLE001
    log(f'fused forward FAILED: {type(e).__name__}: {str(e)[:300]}')
    out['fused_error'] = f'{type(e).__name__}: {str(e)[:300]}'
    _abort_if_terminal_down(e, 'fused_fwd')
  save()

  # --- red-flip validation of the bench gradient-parity leg ----------
  # (round-4 verdict item 6 acceptance: "a deliberately broken kernel
  # env flag flips it red".) HYPERBO_BWD_JOINT=1 enables the joint
  # backward megakernel, hardware-refuted in r13 (wrong d_x despite
  # clean interpret parity) and guard-tested opt-in — exactly the bug
  # class the parity leg exists to catch. With it on, fused-vs-dense
  # d_x parity at n=8192 must blow past the 5e-3 bench threshold.
  try:
    from hyperbo_tpu.ops import pallas_mll as pm
    n8, d8 = 8192, 4
    k8 = jax.random.PRNGKey(4)
    x8 = jax.random.uniform(k8, (n8, d8), jnp.float32) * 2.0
    dl8 = jnp.sin(3.0 * x8 @ jax.random.normal(
        jax.random.fold_in(k8, 1), (d8, 1)))
    core = pm._se_nll_core_fn(256, 512, 2, False, 32, 'se', 'octv',
                              False, pm._bwd_env_config())

    def gx(xv):
      return core(xv, dl8, jnp.float32(1.2), jnp.float32(0.3))

    g_ok = np.asarray(jax.jit(jax.grad(gx))(x8))
    os.environ['HYPERBO_BWD_JOINT'] = '1'
    g_broken = np.asarray(jax.jit(jax.grad(gx))(x8))
    os.environ['HYPERBO_BWD_JOINT'] = '0'
    rel = float(np.max(np.abs(g_broken - g_ok))
                / (np.max(np.abs(g_ok)) + 1e-12))
    out['redflip_joint_rel'] = rel
    out['redflip_detected'] = bool(rel > 5e-3)
    log(f'red-flip (HYPERBO_BWD_JOINT=1) d_x rel {rel:.3e} -> '
        f'{"DETECTED (leg works)" if rel > 5e-3 else "NOT DETECTED"}')
  except Exception as e:  # noqa: BLE001
    log(f'red-flip leg FAILED: {type(e).__name__}: {str(e)[:300]}')
    out['redflip_error'] = f'{type(e).__name__}: {str(e)[:300]}'
    _abort_if_terminal_down(e, 'redflip')
  save()
  log('DONE')


if __name__ == '__main__':
  main()
