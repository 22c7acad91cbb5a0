"""Test environment setup: CPU backend with 8 virtual devices.

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup; once registered, ANY platform selection that
includes 'cpu' deadlocks backend init. Tests must run CPU-only with an
8-device virtual mesh (for sharding tests), so the first pytest process
relaunches itself in a subprocess with a scrubbed environment
(registration disabled via PALLAS_AXON_POOL_IPS=) and relays the
subprocess's output and exit code.
"""

import os
import subprocess
import sys

import pytest

_ENV_SENTINEL = 'HYPERBO_TPU_TEST_ENV'

def pytest_configure(config):
  if os.environ.get(_ENV_SENTINEL) == '1':
    return
  env = dict(os.environ)
  env[_ENV_SENTINEL] = '1'
  env['JAX_PLATFORMS'] = 'cpu'
  # Prevent the sitecustomize axon registration in the child process.
  env['PALLAS_AXON_POOL_IPS'] = ''
  xla_flags = env.get('XLA_FLAGS', '')
  if 'xla_force_host_platform_device_count' not in xla_flags:
    xla_flags += ' --xla_force_host_platform_device_count=8'
  env['XLA_FLAGS'] = xla_flags.strip()
  args = sys.argv[1:]
  # Distribute across worker processes when pytest-xdist is available:
  # isolates XLA-CPU compiler state (a single process accumulating the
  # suite's large interpret-mode Pallas compiles was observed to
  # segfault inside backend_compile ~50 min in) and cuts wall time
  # roughly 2x (226 tests: 46 min at -n 4 vs 75+ min single-process).
  has_n = any(a == '-n' or a == '--numprocesses'
              or a.startswith('-n') or a.startswith('--numprocesses')
              for a in args)
  if not has_n:
    try:
      import xdist  # noqa: F401
      args = args + ['-n', '4']
    except ImportError:
      pass
  result = subprocess.run(
      [sys.executable, '-m', 'pytest'] + args,
      env=env, capture_output=True, text=True)
  output = result.stdout + result.stderr
  # pytest.exit raised from pytest_configure propagates the returncode to
  # the driver and prints the child's report after capture teardown.
  pytest.exit(f'[hyperbo_tpu conftest] tests ran in a CPU-only subprocess '
              f'(axon plugin disabled):\n{output}',
              returncode=result.returncode)
