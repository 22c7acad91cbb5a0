"""hyperbo_tpu: TPU-native GP pre-training + Bayesian optimization.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
google-research/hyperbo (Pre-trained Gaussian Processes for Bayesian
Optimization, JMLR 2024), redesigned TPU-first: MXU matmul Gram
construction, blocked Cholesky, packed multi-task objectives shardable
over device meshes, and fully on-device BO loops with rank-1 posterior
updates.

Layer map (bottom-up):
  core/      data structures, warping, checkpoint I/O
  ops/       gram construction, blocked Cholesky, custom-VJP linalg
  models/    kernels, means, basis fns, objectives, GP/HGP
  train/     adam (host + on-device scan), L-BFGS, BFGS, slice sampler
  bo/        acquisitions, BO loops, registries, input samplers
  data/      PD1 loader, synthetic generators, dataframe processing
  parallel/  mesh utilities, task-sharded training, sharded scoring
  analysis/  results aggregation and plotting
"""

from hyperbo_tpu.core import defs
from hyperbo_tpu.core.defs import GPCache, GPParams, SubDataset

__version__ = '0.1.0'
