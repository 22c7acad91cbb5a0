"""Test environment setup: CPU backend with 8 virtual devices.

The container's sitecustomize registers the axon TPU plugin at interpreter
startup; once registered, selecting JAX_PLATFORMS=cpu deadlocks backend
init. Tests must run CPU-only (with an 8-device virtual mesh for sharding
tests), so if the current interpreter was started with the axon plugin
enabled, re-exec pytest with a scrubbed environment before anything
imports jax.
"""

import os
import sys

_ENV_SENTINEL = 'HYPERBO_TPU_TEST_ENV'

if os.environ.get(_ENV_SENTINEL) != '1':
  env = dict(os.environ)
  env[_ENV_SENTINEL] = '1'
  env['JAX_PLATFORMS'] = 'cpu'
  # Prevent the sitecustomize axon registration in the re-exec'd process.
  env['PALLAS_AXON_POOL_IPS'] = ''
  xla_flags = env.get('XLA_FLAGS', '')
  if 'xla_force_host_platform_device_count' not in xla_flags:
    xla_flags += ' --xla_force_host_platform_device_count=8'
  env['XLA_FLAGS'] = xla_flags.strip()
  os.execve(sys.executable,
            [sys.executable, '-m', 'pytest'] + sys.argv[1:], env)

assert 'jax' not in sys.modules or True  # jax imports happen after this.
