"""Round-17 (driver round 5) hardware session — ONE admitted process.

Legs, in order (each wrapped so an exception cannot leave the process
mid-compile — the r4 lesson that an uncaught raise wedges the tunnel
like a kill):

  1. coarse two-level backward (ops/coarse_bwd, new): n=32768 c=2
     value_and_grad TIMING + d-parity vs the dense XLA-chain backward
     (HYPERBO_BWD_COARSE=0 — the r15-validated 9.04 s/step reference);
     n=24576 timing.
  2. distributed-fused MLL gradient on a REAL 1-device mesh (pallas
     backend under shard_map): value+grad parity vs the single-chip
     fused core and VG timing — the hardware criterion of round-4
     verdict item 1.
  3. HGP-resample dissection (round-4 verdict item 4): standalone
     phase timings (corpus-loss eval, 1-sweep chain, refactor), trip
     statistics from an instrumented chain, and the serial-vs-fused
     stepping-out A/B on the full r8-protocol BO loop (plus selection
     parity between the two — stepping-out fusion is decision-exact).

Run: nohup python benchmarks/r17_session.py > /tmp/r17session.log 2>&1 &
Verdict JSON: /tmp/r17_verdict.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()
VERDICT = {}


def log(*a):
  print(f'[{time.time() - T0:7.1f}s]', *a, file=sys.stderr, flush=True)


def save():
  with open('/tmp/r17_verdict.json', 'w') as f:
    json.dump(VERDICT, f, indent=1, default=str)


from benchmarks._transport import make_abort

_abort_if_terminal_down = make_abort(log)


def leg(tag, fn):
  try:
    t0 = time.time()
    out = fn()
    log(f'{tag}: OK ({time.time() - t0:.1f}s)')
    VERDICT[tag] = out
  except Exception as e:  # noqa: BLE001
    log(f'{tag}: FAILED {type(e).__name__}: {str(e)[:400]}')
    VERDICT[tag] = {'error': f'{type(e).__name__}: {str(e)[:300]}'}
    _abort_if_terminal_down(e, tag)
  save()


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np

  log('devices:', jax.devices())
  t0 = time.time()
  log(f'warmup ok ({float(jnp.sum(jnp.ones((64, 64))))}) '
      f'in {time.time() - t0:.1f}s')

  # ------------------------------------------------------------------
  # Leg 1: coarse two-level backward at n = 32768 / 24576
  # ------------------------------------------------------------------
  from hyperbo_tpu.ops import pallas_mll

  def vg_at(n, d=4, seed=0, reps=3):
    key = jax.random.PRNGKey(seed)
    x = jax.random.uniform(key, (n, d), jnp.float32) * 2.0
    delta = jnp.sin(3.0 * x @ jax.random.normal(
        jax.random.fold_in(key, 1), (d, 1)))
    sv, da = jnp.float32(1.2), jnp.float32(0.3)
    core = pallas_mll._se_nll_core_fn(
        256, 512, 2, False, 32, 'se', 'octv', False,
        pallas_mll._bwd_env_config())

    def loss(xv):
      return core(xv, delta, sv, da)

    vg = jax.jit(jax.value_and_grad(loss))
    v, g = vg(x)
    v = float(v)
    _ = float(jnp.sum(jnp.abs(g)))    # force through the tunnel
    times = []
    for _i in range(reps):
      t0 = time.perf_counter()
      v2, g2 = vg(x)
      sref = float(jnp.sum(jnp.abs(g2)) + v2)  # scalar readback
      times.append(time.perf_counter() - t0)
    return v, np.asarray(g), times, sref

  def leg_coarse():
    out = {}
    os.environ['HYPERBO_BWD_COARSE'] = '1'
    v_c, g_c, t_c, _ = vg_at(32768)
    out['n32768_coarse_s'] = [round(t, 3) for t in t_c]
    log(f'n=32768 coarse VG: {min(t_c):.3f} s/step (times {t_c})')
    os.environ['HYPERBO_BWD_COARSE'] = '0'
    v_d, g_d, t_d, _ = vg_at(32768, reps=1)
    out['n32768_dense_s'] = [round(t, 3) for t in t_d]
    rel = float(np.max(np.abs(g_c - g_d))
                / (np.max(np.abs(g_d)) + 1e-12))
    out['n32768_dx_rel'] = rel
    out['n32768_value_rel'] = abs(v_c - v_d) / (abs(v_d) + 1e-12)
    log(f'n=32768 dense VG: {min(t_d):.3f} s/step; d_x parity '
        f'{rel:.3e}; value rel {out["n32768_value_rel"]:.3e}')
    os.environ['HYPERBO_BWD_COARSE'] = '1'
    _, _, t24, _ = vg_at(24576, reps=2)
    out['n24576_coarse_s'] = [round(t, 3) for t in t24]
    log(f'n=24576 coarse VG: {min(t24):.3f} s/step')
    return out

  leg('coarse_bwd', leg_coarse)

  # ------------------------------------------------------------------
  # Leg 2: distributed-fused MLL gradient, real mesh(1)
  # ------------------------------------------------------------------
  def leg_dist_grad():
    from jax.sharding import Mesh
    from hyperbo_tpu.core import defs
    from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
    from hyperbo_tpu.models import kernel, mean
    from hyperbo_tpu.models import objectives as obj
    from hyperbo_tpu.parallel import large

    out = {}
    n, d = 8192, 4
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (n, d), jnp.float32)
    y = jnp.sin(3.0 * x @ jax.random.normal(
        jax.random.fold_in(key, 1), (d, 1)))
    model = {'constant': 0.1, 'lengthscale': jnp.zeros(d),
             'signal_variance': 0.2, 'noise_variance': -3.0}
    mesh = Mesh(np.array(jax.devices()[:1]), ('task',))

    def loss_dist(m_):
      p = defs.GPParams(model=m_, config={})
      return large.mll_distributed_fused(
          mean.constant, kernel.squared_exponential, p, x, y, mesh,
          warp_func=DEFAULT_WARP_FUNC, backend='pallas',
          interpret=False)

    def loss_dense(m_):
      p = defs.GPParams(model=m_, config={'fused_mll': True})
      ds = {'0': defs.SubDataset(x, y)}
      return obj.neg_log_marginal_likelihood(
          mean.constant, kernel.squared_exponential, p, ds,
          warp_func=DEFAULT_WARP_FUNC)

    vg_dist = jax.jit(jax.value_and_grad(loss_dist))
    vg_dense = jax.jit(jax.value_and_grad(loss_dense))
    v1, g1 = vg_dist(model)
    v1 = float(v1)
    v2, g2 = vg_dense(model)
    v2 = float(v2)
    rels = {}
    for k in model:
      a = np.asarray(g1[k]).ravel()
      b = np.asarray(g2[k]).ravel()
      rels[k] = float(np.max(np.abs(a - b))
                      / (np.max(np.abs(b)) + 1e-12))
    out['grad_rel_per_leaf'] = rels
    out['value_rel'] = abs(v1 - v2) / (abs(v2) + 1e-12)
    times = []
    for _i in range(3):
      t0 = time.perf_counter()
      v, g = vg_dist(model)
      _ = float(v) + float(jnp.sum(jnp.abs(g['lengthscale'])))
      times.append(time.perf_counter() - t0)
    out['vg_dist_mesh1_s'] = [round(t, 4) for t in times]
    log(f'dist-fused VG mesh(1) n={n}: {min(times)*1e3:.1f} ms; '
        f'value rel {out["value_rel"]:.2e}; grad rels {rels}')
    return out

  leg('dist_fused_grad_mesh1', leg_dist_grad)

  # ------------------------------------------------------------------
  # Leg 3: HGP-resample dissection
  # ------------------------------------------------------------------
  from hyperbo_tpu.core import defs
  from hyperbo_tpu.core.warp import DEFAULT_WARP_FUNC
  from hyperbo_tpu.models import kernel, mean
  from hyperbo_tpu.models import packed as packed_lib
  from hyperbo_tpu.bo import ondevice
  from hyperbo_tpu.train import slice_sampler as ss
  from jax import flatten_util

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
  n_max = iters + 8

  model0 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                        dict(model))
  x0_flat, unravel = flatten_util.ravel_pytree(model0)
  p_dim = x0_flat.shape[0]
  xs0 = x0_flat[None, :] + 0.1 * jax.random.normal(
      jax.random.fold_in(key, 7), (S, p_dim))
  x_buf = jnp.zeros((n_max, d), jnp.float32)
  y_buf = jnp.zeros((n_max, 1), jnp.float32)
  count0 = jnp.array(10, jnp.int32)
  x_buf = x_buf.at[:10].set(qx[:10])
  y_buf = y_buf.at[:10].set(qy[:10])

  def lp(v):
    return -ondevice._corpus_loss(
        mean.constant, kernel.squared_exponential, config,
        DEFAULT_WARP_FUNC, n_max, unravel(v), x_buf, y_buf, count0,
        pretrain_packed=pp)

  def timed_fn(fn, *args, reps=4):
    o = fn(*args)
    _ = float(jnp.sum(jnp.abs(o[0] if isinstance(o, tuple) else o)))
    times = []
    for _i in range(reps):
      t0 = time.perf_counter()
      o = fn(*args)
      _ = float(jnp.sum(jnp.abs(o[0] if isinstance(o, tuple) else o)))
      times.append(time.perf_counter() - t0)
    return min(times), times

  def leg_dissect():
    out = {}
    # (a) one corpus-loss eval, batched over S chains
    f_eval = jax.jit(jax.vmap(lp))
    t, _ = timed_fn(f_eval, xs0)
    out['lp_eval_S8_ms'] = t * 1e3
    log(f'corpus-loss eval (vmap S=8): {t*1e3:.3f} ms')
    # (b) one full 1-sweep chain advance, S=8 vmapped (the resample body)
    def chain_all(xs, k):
      def one(xv, kk):
        draws, _ = ss._run_chain(lp, xv, kk, 1, 1.0, 10, 100)
        return draws[-1]
      return jax.vmap(one)(xs, jax.random.split(k, S))
    f_chain = jax.jit(chain_all)
    t, _ = timed_fn(f_chain, xs0, jax.random.PRNGKey(5))
    out['chain_1sweep_S8_ms'] = t * 1e3
    log(f'1-sweep chain advance (S=8, fused stepout): {t*1e3:.1f} ms')
    # (b2) serial-stepout A/B of the same chain
    os.environ['HYPERBO_SLICE_STEPOUT'] = 'serial'
    f_chain_ser = jax.jit(lambda xs, k: chain_all(xs, k))
    t_ser, _ = timed_fn(f_chain_ser, xs0, jax.random.PRNGKey(5))
    out['chain_1sweep_S8_serial_ms'] = t_ser * 1e3
    log(f'1-sweep chain advance (S=8, serial stepout): '
        f'{t_ser*1e3:.1f} ms -> fused speedup {t_ser/t:.2f}x')
    # decision parity serial vs fused
    a = f_chain(xs0, jax.random.PRNGKey(5))
    b = f_chain_ser(xs0, jax.random.PRNGKey(5))
    out['stepout_decision_max_abs'] = float(jnp.max(jnp.abs(a - b)))
    os.environ['HYPERBO_SLICE_STEPOUT'] = 'fused'
    # (c) refactor of all S models
    def refac(xs):
      return jax.vmap(lambda v: ondevice._masked_refactor(
          mean.constant, kernel.squared_exponential, config,
          DEFAULT_WARP_FUNC, unravel(v), x_buf, count0))(xs)
    f_refac = jax.jit(refac)
    t, _ = timed_fn(f_refac, xs0)
    out['refactor_S8_ms'] = t * 1e3
    log(f'refactor all S=8 (n_max={n_max}): {t*1e3:.2f} ms')
    # (d) trip statistics from an instrumented chain (1 sweep):
    # count log-prob serial rounds per coordinate: stepping-out
    # iterations (fused: max(L,R); also per-side L,R) + shrink trips.
    def trips_one(xv, kk):
      ll = lp(xv)
      kk, perm_key = jax.random.split(kk)
      order = jax.random.permutation(perm_key, p_dim)

      def coord(p, state):
        xv, ll, k, stats = state
        k, ck = jax.random.split(k)
        k1, k2, k3, _k4 = jax.random.split(ck, 4)
        log_y = ll + jnp.log(jax.random.uniform(k1))
        i = order[p]
        x0i = xv[i]
        u = jax.random.uniform(k2)
        left0 = x0i - u * 1.0

        def logp_at(v):
          return lp(xv.at[i].set(v))

        def side(sign, e0):
          def cond(st):
            e, j = st
            return (j < 10) & (logp_at(e) > log_y)
          def body(st):
            e, j = st
            return e + sign * 1.0, j + 1
          return jax.lax.while_loop(cond, body, (e0, 0))
        left, jl = side(-1.0, left0)
        right, jr = side(1.0, left0 + 1.0)

        def shrink_cond(st):
          _, _, _, _, _, done, j = st
          return (~done) & (j < 100)

        def shrink_body(st):
          k, left, right, xi, lli, done, j = st
          k, kd = jax.random.split(k)
          x1 = left + jax.random.uniform(kd) * (right - left)
          ll_new = logp_at(x1)
          accept = jnp.isfinite(ll_new) & (ll_new > log_y)
          xi = jnp.where(accept, x1, xi)
          lli = jnp.where(accept, ll_new, lli)
          sl = (~accept) & (x1 < x0i)
          left = jnp.where(sl, x1, left)
          right = jnp.where((~accept) & ~sl, x1, right)
          return k, left, right, xi, lli, accept, j + 1

        _, _, _, xi, lli, _, js = jax.lax.while_loop(
            shrink_cond, shrink_body,
            (k3, left, right, x0i, ll, False, 0))
        stats = stats.at[p, 0].set(jl)
        stats = stats.at[p, 1].set(jr)
        stats = stats.at[p, 2].set(js)
        return xv.at[i].set(xi), lli, k, stats

      stats0 = jnp.zeros((p_dim, 3), jnp.int32)
      _, _, _, stats = jax.lax.fori_loop(
          0, p_dim, coord, (xv, ll, kk, stats0))
      return stats

    f_trips = jax.jit(jax.vmap(trips_one))
    st = np.asarray(f_trips(xs0, jax.random.split(
        jax.random.PRNGKey(5), S)))
    out['trips_mean_LRS'] = [float(v) for v in st.mean((0, 1))]
    out['trips_lane_max_LRS'] = [int(v) for v in st.max((0, 1))]
    # serial depth per coordinate: lane-max over chains of each phase
    lane_max = st.max(0)            # (p, 3) max over chains
    serial_fused = (np.maximum(lane_max[:, 0], lane_max[:, 1]) + 1
                    + lane_max[:, 2]).sum()
    serial_serial = (lane_max[:, 0] + lane_max[:, 1] + 2
                     + lane_max[:, 2]).sum()
    out['serial_evals_per_sweep_fused'] = int(serial_fused)
    out['serial_evals_per_sweep_serial'] = int(serial_serial)
    log(f'trip stats (mean over chains/coords L,R,shrink): '
        f'{out["trips_mean_LRS"]}; lane-max {out["trips_lane_max_LRS"]}; '
        f'serial evals/sweep fused {serial_fused} vs serial '
        f'{serial_serial}')
    return out

  leg('hgp_dissect', leg_dissect)

  # (e) full r8-protocol BO loop A/B
  def bo_rate(tag):
    def run():
      return float(jnp.sum(ondevice.simulated_bayesopt_ondevice_hgp_resample(
          jax.random.PRNGKey(2), model, config, mean.constant,
          kernel.squared_exponential, DEFAULT_WARP_FUNC, queried,
          iters=iters, acquisition='ei', num_samples=S,
          num_train_tasks=23, pretrain_packed=pp,
          resample_every=5, sweeps=1)[1]))
    t0 = time.time()
    s = run()
    t_first = time.time() - t0
    times = []
    for _i in range(3):
      t0 = time.perf_counter()
      run()
      times.append((time.perf_counter() - t0) / iters)
    log(f'{tag}: {min(times)*1e3:.2f} ms/iter (first {t_first:.1f}s '
        f'incl compile; readback {s:.4g})')
    return {'ms_per_iter': min(times) * 1e3,
            'times_ms': [t * 1e3 for t in times]}

  def leg_bo_ab():
    out = {}
    os.environ['HYPERBO_SLICE_STEPOUT'] = 'serial'
    ondevice._BO_RUNNER_CACHE.clear()
    out['serial'] = bo_rate('HGP-resample BO (serial stepout)')
    sel_serial = ondevice.simulated_bayesopt_ondevice_hgp_resample(
        jax.random.PRNGKey(2), model, config, mean.constant,
        kernel.squared_exponential, DEFAULT_WARP_FUNC, queried,
        iters=iters, acquisition='ei', num_samples=S,
        num_train_tasks=23, pretrain_packed=pp,
        resample_every=5, sweeps=1)[2]
    os.environ['HYPERBO_SLICE_STEPOUT'] = 'fused'
    ondevice._BO_RUNNER_CACHE.clear()
    out['fused'] = bo_rate('HGP-resample BO (fused stepout)')
    sel_fused = ondevice.simulated_bayesopt_ondevice_hgp_resample(
        jax.random.PRNGKey(2), model, config, mean.constant,
        kernel.squared_exponential, DEFAULT_WARP_FUNC, queried,
        iters=iters, acquisition='ei', num_samples=S,
        num_train_tasks=23, pretrain_packed=pp,
        resample_every=5, sweeps=1)[2]
    out['selection_parity'] = bool(jnp.all(sel_serial == sel_fused))
    out['speedup'] = out['serial']['ms_per_iter'] / out['fused']['ms_per_iter']
    log(f'BO A/B: serial {out["serial"]["ms_per_iter"]:.2f} vs fused '
        f'{out["fused"]["ms_per_iter"]:.2f} ms/iter '
        f'({out["speedup"]:.2f}x); selection parity '
        f'{out["selection_parity"]}')
    return out

  leg('hgp_bo_ab', leg_bo_ab)

  log('SESSION DONE')
  save()


if __name__ == '__main__':
  main()
