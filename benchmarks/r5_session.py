"""Round-5 hardware session: ALL staged probes in ONE process.

Wedge discipline (CLAUDE.md): tunnel admission costs 10-35 min per
process, a killed in-flight op wedges the tunnel for hours, and a
compile against a dead helper burns ~50 min before connection-refused
surfaces. So: one patient process, no external timeouts, every probe
aborts the session on the first transport failure (each probe's
_abort_if_terminal_down exits with code 2, which this wrapper treats
as session-fatal).

Phases (in value order — earlier results survive a later death):
  1. health      — tiny op + small matmul (registration + first compile)
  2. vmemfix     — r4_vmemfix2_probe: fused-MLL config bisect against
                   the 16 MB scoped-vmem limit (incl. the
                   xla_tpu_scoped_vmem_limit_kib=17408 override leg)
                   + fused-backward-kernel compile check
  3. bwd         — r4_bwd_probe: train-leg dissection + A/B of all
                   backward variants (syrk/default-prec/fused-pallas)
  4. iterative   — r4_iterative_probe: beyond-HBM matrix-free MLL at
                   n=65536 / 131072 + n=8192 crosscheck + matrix-free
                   posterior leg
  5. bo_variants — r5_bo_probe: plain/retrain/qbatch/hgp-resample
                   on-device BO at 100 x 10k production scale
  6. bench       — bench.py (BENCH_MODE=both) as a subprocess, so the
                   driver-visible artifact numbers are refreshed on a
                   known-healthy tunnel (skip with R5_BENCH=0)

Run (background, NEVER timeout-killed):
  nohup python benchmarks/r5_session.py > /tmp/r5session.log 2>&1 &
"""

import json
import os
import runpy
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

# Tunnel compiles cost 60-600 s each; cache the executables across
# probes and re-runs (no-op if the backend can't serialize them).
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

T0 = time.time()
STATUS_PATH = os.environ.get('R5_STATUS', '/tmp/r5_session_status.json')
STATUS = {'phases': {}, 'started_unix': T0}


def log(*a):
  print(f'[r5 {time.time() - T0:8.1f}s]', *a, file=sys.stderr, flush=True)


def save_status():
  with open(STATUS_PATH, 'w') as f:
    json.dump(STATUS, f, indent=1)


def phase(name, fn):
  log(f'===== phase {name} =====')
  t0 = time.time()
  STATUS['phases'][name] = {'state': 'running'}
  save_status()
  try:
    fn()
  except SystemExit as e:
    code = e.code if isinstance(e.code, int) else 1
    STATUS['phases'][name] = {'state': f'exit({code})',
                              's': round(time.time() - t0, 1)}
    save_status()
    if code == 2:
      log(f'phase {name}: TRANSPORT DEAD — aborting the session '
          f'(remaining phases carry to the next healthy window)')
      return False
    log(f'phase {name}: exited {code}; continuing')
    return True
  except Exception as e:  # noqa: BLE001
    STATUS['phases'][name] = {'state': f'{type(e).__name__}',
                              's': round(time.time() - t0, 1)}
    save_status()
    msg = str(e)
    from benchmarks._transport import is_transport_dead
    if is_transport_dead(e):
      log(f'phase {name}: TRANSPORT DEAD ({type(e).__name__}: '
          f'{msg[:200]}) — aborting the session')
      return False
    log(f'phase {name}: FAILED {type(e).__name__}: {msg[:300]}; '
        f'continuing')
    return True
  STATUS['phases'][name] = {'state': 'ok',
                            's': round(time.time() - t0, 1)}
  save_status()
  log(f'phase {name}: done in {time.time() - t0:.1f}s')
  return True


def health():
  import jax
  import jax.numpy as jnp
  log('devices:', jax.devices())
  log('tiny op:', float(jnp.ones((64, 64)).sum()))
  f = jax.jit(lambda a: (a @ a.T).sum())
  a = jnp.ones((256, 256), jnp.float32)
  log('matmul:', float(f(a)))
  log('TUNNEL HEALTHY')


def run_probe(script):
  path = os.path.join(HERE, script)
  sys.argv = [path]
  runpy.run_path(path, run_name='__main__')


def run_bench():
  if os.environ.get('R5_BENCH', '1') != '1':
    log('bench phase skipped (R5_BENCH=0)')
    return
  env = dict(os.environ)
  env.setdefault('BENCH_WATCHDOG_S', '3000')
  proc = subprocess.run(
      [sys.executable, os.path.join(REPO, 'bench.py')],
      capture_output=True, text=True, env=env)
  log('bench stderr tail:\n' + proc.stderr[-3000:])
  log('bench stdout:', proc.stdout.strip())
  STATUS['bench_json'] = proc.stdout.strip().splitlines()[-1:] or ['']
  save_status()


def _acquire_lock(lock):
  """O_EXCL lock with stale-holder detection.

  A session that aborted (transport death) or crashed must not block
  the next healthy-window launch forever: if the recorded pid is no
  longer alive, steal the lock. Returns True when held.
  """
  while True:
    try:
      fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
      os.write(fd, str(os.getpid()).encode())
      os.close(fd)
      return True
    except FileExistsError:
      try:
        with open(lock) as f:
          pid = int(f.read().strip() or '0')
      except (OSError, ValueError):
        pid = 0
      alive = False
      if pid > 0:
        try:
          os.kill(pid, 0)
          alive = True
        except ProcessLookupError:
          alive = False
        except PermissionError:
          alive = True
      if alive:
        log(f'another session (pid {pid}) holds {lock}; exiting')
        return False
      log(f'stale lock from dead pid {pid}; stealing {lock}')
      try:
        os.unlink(lock)
      except FileNotFoundError:
        pass


def main():
  # Two watchers can race to launch the session on recovery; the TPU
  # is exclusive-access, so only one session may run.
  lock = os.environ.get('R5_LOCK', '/tmp/r5_session.lock')
  if not _acquire_lock(lock):
    return
  try:
    for name, fn in (
        ('health', health),
        ('vmemfix', lambda: run_probe('r4_vmemfix2_probe.py')),
        ('bwd', lambda: run_probe('r4_bwd_probe.py')),
        ('iterative', lambda: run_probe('r4_iterative_probe.py')),
        ('bo_variants', lambda: run_probe('r5_bo_probe.py')),
        ('bench', run_bench),
    ):
      if not phase(name, fn):
        break
    log('SESSION COMPLETE; status at', STATUS_PATH)
    save_status()
  finally:
    try:
      os.unlink(lock)
    except FileNotFoundError:
      pass


if __name__ == '__main__':
  main()
