"""Run the REFERENCE package's test suite against hyperbo_tpu.

Copies the upstream test files from /root/reference/hyperbo, installs an
import shim (`hyperbo` -> `hyperbo_tpu`, whose alias packages mirror the
reference layout: basics/, gp_utils/, bo_utils/, plot_utils/), and runs
each file under its own absltest __main__ in a subprocess.

This is the parity gate: the upstream suite encodes the reference's
behavioral contracts (including slice_sampling_test, which the OSS
reference itself cannot pass — its sampler was never released).

Usage: python tools/run_upstream_tests.py [reference_root]
"""

import os
import shutil
import subprocess
import sys
import tempfile

TEST_FILES = [
    'basics/linalg_test.py',
    'gp_utils/kernel_test.py',
    'gp_utils/mean_test.py',
    'gp_utils/utils_test.py',
    'gp_utils/objectives_test.py',
    'gp_utils/gp_test.py',
    'gp_utils/slice_sampling_test.py',
    'bo_utils/acfun_test.py',
    'bo_utils/bayesopt_test.py',
    'bo_utils/data_test.py',
]

SHIM = """
import sys
sys.path.insert(0, {repo!r})
import hyperbo_tpu
sys.modules['hyperbo'] = hyperbo_tpu
import runpy
runpy.run_path({path!r}, run_name='__main__')
"""


def main():
  ref = sys.argv[1] if len(sys.argv) > 1 else '/root/reference/hyperbo'
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  tmp = tempfile.mkdtemp(prefix='upstream_tests_')
  env = dict(os.environ)
  env.update({'JAX_PLATFORMS': 'cpu', 'PALLAS_AXON_POOL_IPS': '',
              'PYTHONPATH': f'{repo}:{tmp}'})
  failures = []
  skipped = []
  for rel in TEST_FILES:
    src = os.path.join(ref, rel)
    if not os.path.isfile(src):
      print(f'SKIP (missing): {rel}')
      skipped.append(rel)
      continue
    dst = os.path.join(tmp, os.path.basename(rel))
    shutil.copy(src, dst)
    code = SHIM.format(repo=repo, path=dst)
    try:
      r = subprocess.run([sys.executable, '-c', code], env=env, cwd=tmp,
                         capture_output=True, text=True, timeout=900)
      returncode, out, err = r.returncode, r.stdout, r.stderr
    except subprocess.TimeoutExpired as e:
      returncode = -1
      out = (e.stdout or b'').decode('utf-8', 'replace') if isinstance(
          e.stdout, bytes) else (e.stdout or '')
      err = 'TIMEOUT after 900s'
    status = 'PASS' if returncode == 0 else 'FAIL'
    print(f'{status}: {rel}')
    if returncode != 0:
      failures.append(rel)
      print(out[-2000:])
      print(err[-2000:])
  n_run = len(TEST_FILES) - len(skipped)
  print(f'\n{n_run - len(failures)}/{n_run} upstream test files pass'
        + (f' ({len(skipped)} skipped: missing from reference)'
           if skipped else ''))
  return 1 if failures else 0


if __name__ == '__main__':
  sys.exit(main())
