"""BPR — Bayesian Personalized Ranking, TPU-native.

Covers the reference's model/cf/model.go:352-557. The reference runs
CountFeedback sequential SGD updates per epoch, each sampling (user uniform,
positive uniform within user, negative by rejection) and applying SIMD axpy
updates. Here the epoch is ONE jitted ``lax.scan`` over minibatched steps:

- users sampled uniformly from users-with-feedback, positive slots sampled
  uniformly per user from a padded positives matrix (same distribution as the
  reference's sampler, model/cf/model.go:450-459);
- negatives sampled uniformly with K-way masked rejection against the user's
  padded positive set (replacing the reference's unbounded retry loop, which
  cannot live inside jit — collision probability after K tries is
  density**K, negligible);
- the pairwise update is the reference's exact per-sample rule
  (model/cf/model.go:469-488) applied as batched scatter-adds, so duplicate
  rows in a batch accumulate like sequential updates do.

All compute is f32 on the MXU/VPU; factors stay on device across epochs and
the epoch state is donated to avoid copies.
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import Dataset
from .base import MatrixFactorization, Score, build_eval_candidates, evaluate_mf
from .params import N_EPOCHS, N_FACTORS, INIT_MEAN, INIT_STDDEV, LR, REG, FitConfig, Params

logger = logging.getLogger(__name__)

_NEG_TRIES = 4  # default K-way rejection draws per negative sample


def history_cap(train) -> tuple[int, int]:
    """(cap, widest) history width for the padded-positives matrix: the FULL
    widest history whenever the padded matrix stays <=96MB (no sampling bias
    on any path), else the p99 width (min 64). Shared by BPR.fit and
    bench.py so the benchmark always measures the trainer's actual policy."""
    lengths = [len(fb) for fb in train.user_feedback if fb]
    widest = max(lengths) if lengths else 1
    if train.count_users() * widest * 4 <= 96 * 1024 * 1024:
        return max(widest, 1), widest
    return max(int(np.percentile(lengths, 99)), 64), widest


def adaptive_neg_tries(mean_density: float, eps: float = 1e-4) -> int:
    """Rejection depth K so the chance every draw collides with a positive
    is ~eps (density**K <= eps). Sparse catalogs (ml-1m-like, d~0.05) get
    K=3; dense small catalogs (the fused path's domain) get up to K=8 —
    matching the reference's unbounded retry loop to within eps while only
    paying for collisions the data can actually produce."""
    import math

    d = min(max(mean_density, 1e-6), 0.9)
    return min(max(math.ceil(math.log(eps) / math.log(d)), 2), 8)


def _sample_pairs(padded_pos, pos_counts, n_items, step_key, n_tries=_NEG_TRIES, bits=None):
    """Sample one (positive, negative) pair per user.

    Positive: uniform slot selected via a one-hot over the history axis
    (take_along_axis row-gathers measured ~7x slower on TPU). Negative:
    K-way rejection with 2D compares per candidate (a single 3D broadcast
    compare is ~12x slower on TPU).

    ``bits``: optional [U, ceil(I/32)] uint32 full-set membership bitset
    (Dataset.positives_bitset). When given, rejection tests candidates
    against the user's FULL positive set — exact even for users whose padded
    history was capped at p99 (the reference rejects against the full set,
    model/cf/model.go:460-468); otherwise candidates are tested against the
    capped ``padded_pos`` rows.
    """
    ks, kn = jax.random.split(step_key)
    n_users, max_len = padded_pos.shape
    slot = jax.random.randint(ks, (n_users,), 0, jnp.maximum(pos_counts, 1))
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_users, max_len), 1)
    pos = jnp.sum(jnp.where(lane == slot[:, None], padded_pos, 0), axis=1)
    pos = jnp.maximum(pos, 0)  # inactive users point at row 0, masked later
    cand = jax.random.randint(kn, (n_users, n_tries), 0, n_items)
    if bits is not None:
        wlane = jax.lax.broadcasted_iota(jnp.int32, bits.shape, 1)
    neg = cand[:, 0]
    ok = jnp.zeros((n_users,), bool)
    for t in range(n_tries):
        c = cand[:, t]
        if bits is None:
            collides = jnp.any(padded_pos == c[:, None], axis=1)
        else:
            word = jnp.sum(
                jnp.where(wlane == (c[:, None] // 32), bits, jnp.uint32(0)), axis=1
            )
            collides = (word >> (c % 32).astype(jnp.uint32)) & 1 == 1
        take = (~ok) & (~collides)
        neg = jnp.where(take, c, neg)
        ok = ok | (~collides)
    return pos, neg


def bpr_apply_pairs(p, q, pos, neg, active, lr, reg):
    """One dense-over-users pairwise sweep given explicit (pos, neg) samples.

    This is the reference's exact per-sample update rule
    (model/cf/model.go:469-488: grad = sigmoid(-diff); q_pos += lr*(grad*p -
    reg*q_pos); q_neg += lr*(-grad*p - reg*q_neg); p += lr*(grad*(q_pos -
    q_neg) - reg*p), with the user update reading the PRE-update item rows,
    as the reference's copies do) applied as batched scatter-adds. When every
    sampled item index is distinct within the sweep this matches the
    sequential oracle (models/oracle.bpr_oracle_sweep) to f32 rounding;
    duplicate item rows accumulate additively from the same q snapshot where
    the oracle chains them — tested in tests/test_oracle.py.

    ``active``: [U, 1] bool — rows with no feedback are masked to no-ops.
    """
    qi = q[pos]
    qj = q[neg]
    diff = jnp.sum(p * (qi - qj), axis=-1)
    cost = jnp.sum(jnp.where(active[:, 0], jax.nn.softplus(-diff), 0.0))
    grad = jnp.where(active, jax.nn.sigmoid(-diff)[:, None], 0.0)
    d_qi = jnp.where(active, lr * (grad * p - reg * qi), 0.0)
    d_qj = jnp.where(active, lr * (-grad * p - reg * qj), 0.0)
    d_pu = jnp.where(active, lr * (grad * (qi - qj) - reg * p), 0.0)
    q = q.at[pos].add(d_qi)
    q = q.at[neg].add(d_qj)
    p = p + d_pu  # dense: every active user was visited
    return p, q, cost


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "n_items", "lr", "reg", "n_tries"),
    donate_argnums=(0, 1),
)
def _bpr_epoch(
    user_factors: jax.Array,  # [U, k]
    item_factors: jax.Array,  # [I, k]
    padded_pos: jax.Array,  # [U, L] int32, pad=-1
    pos_counts: jax.Array,  # [U] int32 (0 for users without feedback)
    key: jax.Array,
    n_steps: int,
    n_items: int,
    lr: float,
    reg: float,
    n_tries: int = _NEG_TRIES,
    bits: jax.Array | None = None,
):
    """One BPR epoch: scan of n_steps dense-over-users SGD sweeps.

    TPU-native formulation: every step visits ALL users at once (one pairwise
    sample per user), so the user-side update is a fully dense add — no user
    sampling gather, no user-table scatter, and the padded-positives matrix is
    read contiguously instead of row-gathered. Only the two item-table
    scatter-adds remain irregular. Per epoch this performs
    ``n_steps * U ~= nnz`` pairwise updates — the reference's per-epoch sample
    count (model/cf/model.go:448) with an exactly-uniform user visitation
    instead of with-replacement sampling.

    ``bits``: optional full-set rejection bitset (see _sample_pairs).
    """
    active = (pos_counts > 0)[:, None]  # [U, 1] users with feedback

    def step(carry, step_key):
        p, q = carry
        pos, neg = _sample_pairs(padded_pos, pos_counts, n_items, step_key, n_tries, bits)
        p, q, cost = bpr_apply_pairs(p, q, pos, neg, active, lr, reg)
        return (p, q), cost

    keys = jax.random.split(key, n_steps)
    (user_factors, item_factors), costs = jax.lax.scan(step, (user_factors, item_factors), keys)
    return user_factors, item_factors, jnp.sum(costs)


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "n_items", "lr", "reg", "n_tries"),
    donate_argnums=(0, 1),
)
def _bpr_epoch_fused(
    user_factors: jax.Array,  # [U, k]
    q_packed: jax.Array,  # [R, 128] packed item factors (ops/bpr_kernel)
    padded_pos: jax.Array,
    pos_counts: jax.Array,
    key: jax.Array,
    n_steps: int,
    n_items: int,
    lr: float,
    reg: float,
    n_tries: int = _NEG_TRIES,
):
    """Fully-fused epoch: sampling (on-chip PRNG), gather, update, and
    scatter all inside the Pallas kernel
    (ops/bpr_kernel.bpr_fully_fused_step). TPU-only; requires k | 128.
    The hardware PRNG stream differs from jax.random, so fused and XLA
    epochs match in distribution, not bitwise."""
    from ..ops.bpr_kernel import bpr_fully_fused_step

    # per-epoch base seed from the key; per-step seeds offset from it
    base_seed = jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    def step(carry, i):
        p, qp = carry
        p, q_delta, cost, _, _ = bpr_fully_fused_step(
            p, qp, padded_pos, pos_counts, base_seed + i,
            n_items=n_items, lr=lr, reg=reg, mm_dtype=jnp.bfloat16,
            n_tries=n_tries,
        )
        return (p, qp + q_delta), cost

    (user_factors, q_packed), costs = jax.lax.scan(
        step, (user_factors, q_packed), jnp.arange(n_steps, dtype=jnp.int32)[:, None]
    )
    return user_factors, q_packed, jnp.sum(costs)


def _bpr_epoch_resident(
    user_factors: jax.Array,
    q_packed: jax.Array,
    padded_pos: jax.Array,
    pos_counts: jax.Array,
    key: jax.Array,
    n_steps: int,
    n_items: int,
    lr: float,
    reg: float,
    n_tries: int = _NEG_TRIES,
):
    """Whole-epoch Pallas kernel: all state (positives, factors, packed item
    table) VMEM-resident across every step of the epoch
    (ops/bpr_kernel.bpr_epoch_fused). Fastest path when the problem fits
    VMEM; gated by fits_epoch_resident()."""
    from ..ops.bpr_kernel import bpr_epoch_fused

    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)
    return bpr_epoch_fused(
        user_factors, q_packed, padded_pos, pos_counts, seed,
        n_steps=n_steps, n_items=n_items, lr=lr, reg=reg,
        n_tries=n_tries,
    )


class BPR(MatrixFactorization):
    """BPR matrix factorization (reference: model/cf/model.go:352-557).

    Hyper-parameters and defaults match the reference's SetParams
    (model/cf/model.go:386-395).
    """

    name = "bpr"

    def __init__(self, params: Params | dict | None = None) -> None:
        super().__init__(params)
        p = self.params
        self.n_factors = p.get_int(N_FACTORS, 16)
        self.n_epochs = p.get_int(N_EPOCHS, 100)
        self.lr = p.get_float(LR, 0.05)
        self.reg = p.get_float(REG, 0.01)
        self.init_mean = p.get_float(INIT_MEAN, 0.0)
        self.init_stddev = p.get_float(INIT_STDDEV, 0.001)

    def fit(self, train: Dataset, test: Dataset, config: FitConfig | None = None) -> Score:
        config = config or FitConfig()
        self.init(train, seed=config.seed)
        # History width: use the FULL widest history whenever the padded
        # matrix stays small (<=96MB) — no sampling bias on any path. Only
        # for corpora where that is too wide, cap at p99 (min 64): capped
        # users then sample positives from a per-fit random subset, and the
        # XLA path additionally rejects negatives against a full-set bitset
        # (the reference's semantics, model/cf/model.go:460-468); the Pallas
        # kernel paths reject against the capped rows only — the residual
        # bias is confined to the >p99 tail and quantified in
        # tests/test_oracle.py::test_capped_rejection_bias_is_small.
        cap, widest = history_cap(train)
        n_users_total = train.count_users()
        csr = train.padded_user_positives(max_len=cap, seed=config.seed)
        padded_pos = jnp.asarray(csr.padded)
        pos_counts = jnp.asarray(csr.counts)
        n_items = train.count_items()
        n_active = max(int(np.sum(csr.counts > 0)), 1)
        # each step visits every user once; match the reference's nnz
        # pairwise updates per epoch (model/cf/model.go:448)
        n_steps = max(round(train.count_feedback() / n_active), 1)
        # negative-rejection depth sized to this corpus's collision rate
        mean_density = float(np.mean(csr.counts)) / max(n_items, 1)
        n_tries = adaptive_neg_tries(mean_density)
        eval_cands = build_eval_candidates(test, train, config.candidates)

        key = jax.random.PRNGKey(config.seed + 1)
        metrics = evaluate_mf(self.user_factors, self.item_factors, *eval_cands, config.top_k)
        history = [(0, metrics["NDCG"])]
        logger.info("fit bpr 0/%d NDCG@%d=%.4f", self.n_epochs, config.top_k, metrics["NDCG"])

        # Kernel policy (all numbers measured on v5e, see bench.py):
        # - fused/resident Pallas when the packed catalog fits VMEM (~8k
        #   items at k=16): the one-hot gather/scatter matmuls are near-free
        #   and the whole epoch runs on-chip (57M ex/s at ml-1m vs 38M XLA).
        # - XLA scatter path beyond that: its gather/scatter cost scales
        #   with ACTIVE users, not catalog size (41M ex/s at ml-20m k=64,
        #   26M at 100k x 50k). A hand-written HBM-resident "streamed"
        #   Pallas kernel for this regime was built in r1-r2 and RETIRED in
        #   r3: its blocked one-hot matmuls did O(users x packed_rows) work
        #   per sweep and measured 3.7x slower than the XLA scatter path at
        #   ml-20m with no winning regime (ops/bpr_kernel.py:433 records
        #   the numbers) — XLA scatter is the chosen large-catalog design.
        k = self.n_factors
        packed_rows = -(-train.count_items() * k // 128)
        vmem_bytes = (
            2 * packed_rows * 128 * 4  # q_packed + delta accumulator
            + 3 * 512 * -(-csr.padded.shape[1] // 128) * 128 * 4  # pp block buffers
        )
        on_tpu_packable = jax.default_backend() == "tpu" and 128 % k == 0
        # crossover measured at 50k users on v5e: fused wins at 500 packed
        # rows (41.2M vs 38.2M XLA), loses at 1000 (36.4M vs 39.1M)
        use_fused = (
            on_tpu_packable
            and packed_rows <= 768
            and vmem_bytes < 10 * 1024 * 1024
        )
        use_resident = False
        if use_fused:
            from ..ops.bpr_kernel import fits_epoch_resident, pack_items, unpack_items

            use_resident = fits_epoch_resident(
                train.count_users(), csr.padded.shape[1], packed_rows, k
            )

        p, q = self.user_factors, self.item_factors
        n_users = train.count_users()
        mesh = getattr(config, "mesh", None)
        use_sharded = mesh is not None and mesh.size > 1
        epoch_sharded = None
        uids = None
        use_catalog = False
        if use_sharded and getattr(config, "shard_table", False):
            # catalog-sharded training (SURVEY §2.7, parallel/catalog.py):
            # item table row-sharded with per-step a2a row exchanges —
            # per-device memory O(I/D·k), collective payload O(U_local·k)
            # independent of catalog size. sync_every does not apply (rows
            # are exchanged fresh every step by construction).
            from ..parallel.catalog import (
                make_catalog_sharded_bpr_epoch,
                shard_catalog_bpr_inputs,
            )

            use_catalog = True
            use_resident = use_fused = False
            epoch_sharded = make_catalog_sharded_bpr_epoch(
                mesh, n_steps=n_steps, n_items=n_items, lr=self.lr,
                reg=self.reg, n_tries=n_tries,
            )
            p, q, padded_pos, pos_counts, uids, _, _ = shard_catalog_bpr_inputs(
                mesh, p, q, csr.padded, csr.counts
            )
            self.catalog_drop_count = None
        elif use_sharded:
            # users sharded over all mesh devices, item updates psum'd per
            # step (parallel/sharded.py); sampling is sharding-invariant so
            # results match the single-device epochs
            from ..parallel.sharded import (
                make_sharded_bpr_epoch,
                make_sharded_bpr_epoch_fused,
                shard_bpr_inputs,
            )

            use_resident = False
            p, q_repl, padded_pos, pos_counts, uids, _ = shard_bpr_inputs(
                mesh, p, q, csr.padded, csr.counts
            )
            # local-SGD bounded staleness: sync item updates every N steps
            # (accuracy cost at ml-1m scale measured in PARITY.md)
            sync_every = max(int(getattr(config, "sync_every", 1)), 1)
            if n_steps % sync_every:
                n_steps = -(-n_steps // sync_every) * sync_every
            if use_fused:
                from jax.sharding import PartitionSpec as P

                from ..parallel.sharded import place_global

                epoch_sharded = make_sharded_bpr_epoch_fused(
                    mesh, n_steps=n_steps, n_items=n_items, lr=self.lr,
                    reg=self.reg, n_tries=n_tries, sync_every=sync_every,
                )
                # multihost-safe replicated placement (device_put rejects
                # non-addressable devices under jax.distributed)
                q = place_global(mesh, pack_items(q), P())
            else:
                epoch_sharded = make_sharded_bpr_epoch(
                    mesh, n_steps=n_steps, n_items=n_items, lr=self.lr,
                    reg=self.reg, n_tries=n_tries, sync_every=sync_every,
                )
                q = q_repl
        elif use_fused:
            q = pack_items(q)
        # full-set rejection bitset for the XLA path when the p99 cap bit
        # and the bitset is affordable (see cap comment above)
        bits = None
        if (
            not use_sharded
            and not (use_fused or use_resident)
            and cap < widest
            and n_users_total * (-(-n_items // 32)) * 4 <= 64 * 1024 * 1024
        ):
            bits = jnp.asarray(train.positives_bitset())
        for epoch in range(1, self.n_epochs + 1):
            t0 = time.time()
            key, epoch_key = jax.random.split(key)
            if use_sharded:
                p, q, cost = epoch_sharded(p, q, padded_pos, pos_counts, uids, epoch_key)
                if use_catalog:
                    self.catalog_drop_count = cost[1]
                cost = cost[0]
            else:
                epoch_fn = (
                    _bpr_epoch_resident
                    if use_resident
                    else _bpr_epoch_fused if use_fused else _bpr_epoch
                )
                kwargs = dict(
                    n_steps=n_steps, n_items=n_items,
                    lr=self.lr, reg=self.reg, n_tries=n_tries,
                )
                if bits is not None:
                    kwargs["bits"] = bits
                p, q, cost = epoch_fn(
                    p, q, padded_pos, pos_counts, epoch_key, **kwargs
                )
            if (config.verbose and epoch % config.verbose == 0) or epoch == self.n_epochs:
                cost = float(cost)  # blocks; also syncs the epoch
                if use_fused:
                    q_eval = unpack_items(q, n_items, self.n_factors)
                elif use_catalog:
                    from ..parallel.catalog import unpack_catalog

                    q_eval = jnp.asarray(
                        unpack_catalog(np.asarray(q), n_items, mesh.size)
                    )
                else:
                    q_eval = q
                metrics = evaluate_mf(p[:n_users], q_eval, *eval_cands, config.top_k)
                history.append((epoch, metrics["NDCG"]))
                if config.checkpoint_dir:
                    np.savez(
                        f"{config.checkpoint_dir}/bpr_epoch_{epoch}.npz",
                        user_factors=np.asarray(p[:n_users]),
                        item_factors=np.asarray(q_eval),
                        epoch=epoch,
                        ndcg=metrics["NDCG"],
                    )
                logger.info(
                    "fit bpr %d/%d fit=%.2fs cost=%.1f NDCG@%d=%.4f P@%d=%.4f R@%d=%.4f",
                    epoch, self.n_epochs, time.time() - t0, cost,
                    config.top_k, metrics["NDCG"], config.top_k,
                    metrics["Precision"], config.top_k, metrics["Recall"],
                )
                # early stopping (reference: model/cf/model.go:507-517)
                if config.patience > 0 and epoch > config.patience:
                    best_epoch = max(history, key=lambda t: t[1])[0]
                    if best_epoch <= epoch - config.patience:
                        logger.info("early stopping at epoch %d (best %d)", epoch, best_epoch)
                        break
        if use_fused:
            q = unpack_items(q, n_items, self.n_factors)
        elif use_catalog:
            from ..parallel.catalog import unpack_catalog

            q = jnp.asarray(unpack_catalog(np.asarray(q), n_items, mesh.size))
        p = p[:n_users]
        self.user_factors, self.item_factors = p, q
        metrics = evaluate_mf(p, q, *eval_cands, config.top_k)
        return Score(ndcg=metrics["NDCG"], precision=metrics["Precision"], recall=metrics["Recall"])
