"""ctypes binding for the native JSONL trial-table scanner.

Builds hyperbo_tpu/native/fastjsonl.cpp on first use (g++ -O3 -shared)
and caches the shared object next to the source. All consumers fall back
to the pandas path when the toolchain or the flat-JSON assumption is
unavailable (see data/pd1.py).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'fastjsonl.cpp')
_SO = os.path.join(_DIR, '_fastjsonl.so')
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build() -> bool:
  cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _SO]
  try:
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return True
  except (OSError, subprocess.CalledProcessError) as e:
    logging.info('native jsonl build failed (%s); using pandas fallback',
                 getattr(e, 'stderr', e))
    return False


def _get_lib() -> Optional[ctypes.CDLL]:
  global _LIB, _BUILD_FAILED
  with _LOCK:
    if _LIB is not None:
      return _LIB
    if _BUILD_FAILED:
      return None
    if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                   os.path.getmtime(_SRC)):
      if not _build():
        _BUILD_FAILED = True
        return None
    lib = ctypes.CDLL(_SO)
    lib.pd1_parse.restype = ctypes.c_long
    lib.pd1_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char_p)),
    ]
    lib.pd1_free.restype = None
    lib.pd1_free.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long]
    _LIB = lib
    return _LIB


def available() -> bool:
  return _get_lib() is not None


def parse_jsonl(path: str, numeric_keys: Sequence[str],
                string_key: str) -> Optional[Tuple[np.ndarray, List[str]]]:
  """Extract numeric columns + one string column from a JSONL file.

  Returns (values [nrows x n_keys] float64, strings list) or None when
  the native library is unavailable or parsing fails.
  """
  lib = _get_lib()
  if lib is None:
    return None
  keys = (ctypes.c_char_p * len(numeric_keys))(
      *[k.encode() for k in numeric_keys])
  out_values = ctypes.POINTER(ctypes.c_double)()
  out_strings = ctypes.POINTER(ctypes.c_char_p)()
  nrows = lib.pd1_parse(path.encode(), keys, len(numeric_keys),
                        string_key.encode(),
                        ctypes.byref(out_values),
                        ctypes.byref(out_strings))
  if nrows < 0:
    return None
  try:
    values = np.ctypeslib.as_array(
        out_values, shape=(nrows, len(numeric_keys))).copy()
    strings = [out_strings[i].decode() for i in range(nrows)]
  finally:
    lib.pd1_free(out_values, out_strings, nrows)
  return values, strings
