"""gcn_maxcut_tpu — a TPU-native GNN framework for unsupervised k-way max-cut.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
research repo ``MJavaadAkhtar/GCN-max-cut`` (see SURVEY.md): seeded random
regular-graph generation with terminal nodes, terminal normalization,
dense-extended node embeddings, a 2-layer GCN with a differentiable
negative-cut loss and straight-through terminal pinning/argmax, probabilistic
post-processing, randomized/heuristic/exact baselines, and analysis reports —
all built TPU-first (static shapes, padded CSR/COO sparse adjacency,
segment-sum + Pallas SpMM kernels, pjit/shard_map multi-chip scaling).

Layout:
  core/        sparse graph containers (static-shape pytrees), padding
  ops/         SpMM/SDDMM (XLA segment-sum + Pallas kernels), STE ops
  models/      GCNConv (DGL GraphConv semantics), GCNSoftmax, GCNDev
  objectives/  differentiable cut losses, penalties, QUBO loss
  data/        graph generation (host + on-device), terminal normalization,
               dataset assembly/serialization
  train/       configs, optimizer, training loop, checkpointing
  eval/        decoders, vmapped post-processing sampler, analysis, reports
  baselines/   randomized k-way, SA, BLS, local search, exact solvers
  parallel/    mesh setup, edge partitioning, halo exchange, sharded SpMM
  bench/       roofline model, microbenchmarks
  viz/         publication charts (matplotlib, gated)
  utils/       timing, logging, profiling helpers
"""

__version__ = "0.1.0"
