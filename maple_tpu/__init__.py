"""maple-tpu: a TPU-native maximum-likelihood phylogenetics framework.

A from-scratch re-design of the capabilities of MAPLE (De Maio et al.,
"MAPLE: MAximum Parsimonious Likelihood Estimation" — reference implementation
``MAPLEv0.7.5.4.py``) for pandemic-scale, low-divergence datasets, built
TPU-first on JAX/XLA/Pallas:

- sparse "genome list" partial-likelihood representation (run-length diffs
  from a local reference) with exact host-side semantics in
  :mod:`maple_tpu.core`,
- batched device kernels over padded entry tensors in :mod:`maple_tpu.ops`
  (candidate-placement batching is the TPU compute axis),
- tree runtime with incremental dirty-propagation in
  :mod:`maple_tpu.runtime`,
- placement / SPR / root search in :mod:`maple_tpu.search`,
- multi-host scale-out over ``jax.sharding.Mesh`` in
  :mod:`maple_tpu.parallel`,
- MAPLE/newick/nexus I-O in :mod:`maple_tpu.io`.
"""

__version__ = "0.1.0"
