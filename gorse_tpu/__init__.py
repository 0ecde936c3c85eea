"""gorse_tpu — a TPU-native recommender-system engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of gorse
(reference: gorse-io/gorse, studied at /root/reference):

- ``gorse_tpu.data``     — datasets, dictionaries, splits, loaders
  (reference: dataset/).
- ``gorse_tpu.ops``      — TPU compute kernels: blocked top-k retrieval,
  similarity matmuls, ranking metrics (reference: common/floats, common/ann).
- ``gorse_tpu.models``   — BPR / eALS matrix factorization, AFM CTR ranker,
  hyper-parameter search (reference: model/cf, model/ctr).
- ``gorse_tpu.parallel`` — device meshes, sharding rules, multi-host helpers
  (reference: common/parallel — reborn as jax.sharding over TPU meshes).
- ``gorse_tpu.logics``   — recommendation composition: recommender chain,
  item-to-item, user-to-user, non-personalized (reference: logics/).
- ``gorse_tpu.storage``  — pluggable data/cache/blob stores (reference: storage/).
- ``gorse_tpu.serve``    — master/server/worker node roles + REST API
  (reference: master/, server/, worker/).
- ``gorse_tpu.utils``    — config, logging, progress monitoring
  (reference: config/, common/log, common/monitor).
"""

__version__ = "0.1.0"
