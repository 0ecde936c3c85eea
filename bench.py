"""Benchmark: BPR-MF training throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.md north star): BPR training examples/s per chip on
an ml-1m-shaped dataset (6040 users x 3706 items, ~1M implicit feedback,
k=16). The reference's Go single-node trainer (model/cf/model.go:448-490,
SIMD axpy hot loop, all cores) sustains on the order of 1.6M examples/s on a
modern many-core CPU; the north-star target is >=20x that (BASELINE.json).
``vs_baseline`` reports ours / 1.6e6 — i.e. the multiple over the estimated
Go trainer; >=20 meets the target.
"""

from __future__ import annotations

import json
import time

GO_TRAINER_EXAMPLES_PER_S = 1.6e6  # estimated reference throughput (see docstring)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gorse_tpu.data import synthetic_cf
    from gorse_tpu.models import BPR, Params
    from gorse_tpu.models.bpr import (
        _bpr_epoch,
        _bpr_epoch_fused,
        _bpr_epoch_resident,
        adaptive_neg_tries,
    )
    from gorse_tpu.ops.bpr_kernel import fits_epoch_resident, pack_items

    # ml-1m-shaped synthetic dataset
    data = synthetic_cf(n_users=6040, n_items=3706, rank=16, density=0.045, seed=0)
    train, _ = data.split_cf(seed=0)
    nnz = train.count_feedback()

    model = BPR(Params(n_factors=16))
    model.init(train)
    csr = train.padded_user_positives()
    padded_pos = jnp.asarray(csr.padded)
    pos_counts = jnp.asarray(csr.counts)
    n_active = max(int(np.sum(csr.counts > 0)), 1)

    n_steps = max(round(nnz / n_active), 1)
    n_items = train.count_items()
    # same density-adaptive rejection depth as BPR.fit (models/bpr.py)
    n_tries = adaptive_neg_tries(float(np.mean(csr.counts)) / max(n_items, 1))
    kwargs = dict(n_steps=n_steps, n_items=n_items, lr=0.05, reg=0.01, n_tries=n_tries)

    use_fused = jax.default_backend() == "tpu"
    p, q = model.user_factors, model.item_factors
    if use_fused:
        q = pack_items(q)
        resident = fits_epoch_resident(
            train.count_users(), csr.padded.shape[1], q.shape[0], 16
        )
        epoch_fn = _bpr_epoch_resident if resident else _bpr_epoch_fused
    else:
        epoch_fn = _bpr_epoch
    key = jax.random.PRNGKey(0)
    # warmup + compile
    key, k0 = jax.random.split(key)
    p, q, cost = epoch_fn(p, q, padded_pos, pos_counts, k0, **kwargs)
    _ = float(cost)

    # Epochs chain on-device via the (p, q) data dependency; the final
    # float() forces one host transfer so the tunnel's async dispatch can't
    # fake completion (block_until_ready alone returns early through axon).
    # The MARGINAL rate between two epoch counts (min over repetitions)
    # cancels the tunnel's fixed dispatch+readback cost and its slow bursts.
    def timed(n_epochs: int) -> float:
        nonlocal key, p, q
        t0 = time.perf_counter()
        for _ in range(n_epochs):
            key, ke = jax.random.split(key)
            p, q, cost = epoch_fn(p, q, padded_pos, pos_counts, ke, **kwargs)
        _ = float(cost)
        return time.perf_counter() - t0

    lo_epochs, hi_epochs = 5, 25
    timed(lo_epochs), timed(hi_epochs)  # warm both trace paths
    d_lo = min(timed(lo_epochs) for _ in range(3))
    d_hi = min(timed(hi_epochs) for _ in range(3))
    if d_hi <= d_lo:  # timing noise inverted the marginal — fall back to the
        # conservative total rate of the longer run instead of emitting garbage
        examples_per_s = hi_epochs * n_steps * n_active / d_hi
    else:
        examples_per_s = (hi_epochs - lo_epochs) * n_steps * n_active / (d_hi - d_lo)
    print(json.dumps({
        "metric": "bpr_train_examples_per_s",
        "value": round(examples_per_s),
        "unit": "examples/s/chip",
        "vs_baseline": round(examples_per_s / GO_TRAINER_EXAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
