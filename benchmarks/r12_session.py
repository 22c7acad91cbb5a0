"""Round-12 hardware session: tiled-SYRK backward-kernel ladder + bench.

Wedge discipline (CLAUDE.md): one patient process, no external
timeouts, every probe aborts the session on the first transport
failure (exit code 2 is session-fatal; remaining phases carry to the
next healthy window).

Phases:
  1. health — tiny op + small matmul (registration + first compile)
  2. bwd    — r12_bwd_tile_probe: 2-D tiled backward-kernel ladder,
              VG component dissection, end-to-end VG at the winner
              (r11 baselines: VG 21.4/119.0 ms; bwd-seq ~60 ms @16k)
  3. bench  — bench.py (full) as a subprocess; library default knobs
              now resolve bare 'pallas' to the panel route (skip with
              R12_BENCH=0)

Run (background, NEVER timeout-killed):
  nohup python benchmarks/r12_session.py > /tmp/r12session.log 2>&1 &
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

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

T0 = time.time()
STATUS_PATH = os.environ.get('R12_STATUS',
                             '/tmp/r12_session_status.json')
STATUS = {'phases': {}, 'started_unix': T0}


def log(*a):
  print(f'[r12 {time.time() - T0:8.1f}s]', *a, file=sys.stderr,
        flush=True)


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
      log(f'phase {name}: TRANSPORT DEAD — aborting the session')
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
  if os.environ.get('R12_BENCH', '1') != '1':
    log('bench phase skipped (R12_BENCH=0)')
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
  """O_EXCL lock with stale-holder detection (see r5_session)."""
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
  lock = os.environ.get('R12_LOCK', '/tmp/r12_session.lock')
  if not _acquire_lock(lock):
    return
  try:
    for name, fn in (
        ('health', health),
        ('bwd', lambda: run_probe('r12_bwd_tile_probe.py')),
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
