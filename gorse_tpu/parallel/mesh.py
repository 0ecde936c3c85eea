"""Device meshes and sharding rules.

The reference's parallelism is goroutine pools + consistent-hash user sharding
(common/parallel/, worker/worker.go:429-458). The TPU-native rebirth:

- ``data`` mesh axis — batch/data parallelism (the goroutine pool analog);
- ``model`` mesh axis — row-sharded user/item embedding tables (the TP analog
  gorse lacks; SURVEY.md §2.7 names it as owed), with XLA/GSPMD inserting
  all-gather/reduce-scatter collectives over ICI for gathers and scatter-adds
  into sharded tables.

Everything goes through ``jax.sharding``: pick a mesh, annotate shardings,
let XLA insert collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int | None = None,
    devices: list | None = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    ``model_parallel`` defaults to min(n_devices, 2) rounded to a divisor, so
    small CPU meshes exercise both axes. A 1-device mesh is valid (both axes
    size 1) — the same code path runs single-chip and multi-chip.
    """
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n >= 2 else 1
    assert n % model_parallel == 0, f"{n} devices not divisible by model_parallel={model_parallel}"
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mf_shardings(mesh: Mesh) -> dict[str, NamedSharding]:
    """Sharding rules for matrix-factorization training.

    Factor tables are row-sharded over the model axis (the sharded embedding
    tables of SURVEY.md §2.7); per-step batches are sharded over the data
    axis; small per-user metadata is replicated.
    """
    return {
        "user_factors": NamedSharding(mesh, P(MODEL_AXIS, None)),
        "item_factors": NamedSharding(mesh, P(MODEL_AXIS, None)),
        "padded_pos": NamedSharding(mesh, P(MODEL_AXIS, None)),
        "batch": NamedSharding(mesh, P(DATA_AXIS)),
        "replicated": NamedSharding(mesh, P()),
    }


def put_sharded(x, sharding: NamedSharding):
    """Device-put with an explicit sharding."""
    return jax.device_put(x, sharding)
