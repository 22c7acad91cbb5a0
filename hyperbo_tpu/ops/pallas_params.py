"""Shared Mosaic compiler parameters for the hot Pallas kernels.

The 2026-08 libtpu build enforces a 16 MB default scoped-VMEM ceiling
against the kernel's declared scratch PLUS Mosaic's own stack of live
temporaries; the shipping fused-MLL config overflows it by 128 KiB
standalone (PERF.md, round-4 toolchain drift) even though physical
VMEM on v5e is far larger (public JAX splash-attention kernels raise
the same knob to 128 MiB). Raising ``vmem_limit_bytes`` per kernel is
the surgical fix: it widens only these kernels' budget without a
whole-program ``xla_tpu_scoped_vmem_limit_kib`` compiler option.

``HYPERBO_VMEM_LIMIT_KIB`` overrides the default (65536 KiB); ``0``
restores the toolchain default (useful for bisecting real regressions
in kernel scratch appetite).
"""

import os

from jax.experimental.pallas import tpu as pltpu

_DEFAULT_KIB = 65536


def vmem_limit_bytes():
  """The scoped-VMEM ceiling to request, or None for toolchain default."""
  raw = os.environ.get('HYPERBO_VMEM_LIMIT_KIB', '').strip()
  kib = int(raw) if raw else _DEFAULT_KIB
  return kib * 1024 if kib > 0 else None


def compiler_params(**kwargs):
  """pltpu.CompilerParams with the raised scoped-VMEM ceiling applied."""
  return pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes(),
                              **kwargs)
