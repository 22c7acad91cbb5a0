"""Reference-compatible alias package: hyperbo.basics -> hyperbo_tpu.

Users of the reference import `hyperbo.basics.{definitions, linalg,
params_utils, data_utils, lbfgs, bfgs}`; these modules re-export the
TPU-native implementations under the same names.
"""
from hyperbo_tpu.basics import bfgs, data_utils, definitions, lbfgs, linalg, params_utils  # noqa: F401
