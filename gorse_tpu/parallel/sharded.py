"""Explicitly sharded training and retrieval over a device mesh.

The north-star scaling design (SURVEY.md §2.7, §7): user-dimension sharding
of BPR training (each device owns a contiguous user shard — the TPU rebirth
of the reference's consistent-hash user sharding, worker/worker.go:429-458)
and item-dimension sharding of exact top-k retrieval. Built on
``jax.shard_map`` with explicit collectives:

- BPR epoch: user table, padded positives, and counts are row-sharded over
  the ``data`` axis; the item table is replicated and item-factor updates are
  combined with one ``psum`` per ``sync_every`` steps (dense [I, k] delta —
  items tables are small relative to user counts; catalog-sharded variants
  ride the same mesh with gather/all-to-all instead).
- top-k retrieval: item factors row-sharded over all devices; each shard
  computes a local top-k, results are all-gathered and merged — the
  partial-top-k + merge pattern.

Sampling uses per-(step, GLOBAL user-id) counter-based randomness — an
explicit threefry-2x32 block per (user, column) counter — so each device
generates ONLY its shard's rows at O(U_local) cost while any sharding of
the user axis produces bit-identical streams (verified in
tests/test_sharded.py). The r3 implementation materialized the full
[U_total, n] uniform table on every device and sliced it, an O(U_total)
per-device cost that capped scaling (VERDICT r3 missing #2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG_TRIES = 4

# Threefry-2x32 rotation schedule (Salmon et al., SC'11 "Parallel random
# numbers: as easy as 1, 2, 3" — the Random123 counter-based PRNG family;
# also the generator behind jax.random). Implemented explicitly so a shard
# can generate an arbitrary SUBSET of the counter space: jax.random.uniform
# only generates dense leading-axis tables, which is what forced the r3
# full-table-then-slice formulation.
_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)


def _rotl(x: jax.Array, r: int) -> jax.Array:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _threefry2x32(k0, k1, x0: jax.Array, x1: jax.Array):
    """20-round threefry-2x32: encrypt counter words (x0, x1) under key
    (k0, k1). All inputs uint32; returns two uint32 arrays of x0's shape."""
    ks = (k0, k1, k0 ^ k1 ^ _PARITY)
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for d in range(5):
        for j in range(4):
            x0 = x0 + x1
            x1 = _rotl(x1, _ROT[(d % 2) * 4 + j]) ^ x0
        x0 = x0 + ks[(d + 1) % 3]
        x1 = x1 + ks[(d + 2) % 3] + np.uint32(d + 1)
    return x0, x1


def _bits_to_uniform(bits: jax.Array) -> jax.Array:
    """uint32 -> f32 in [0, 1): stuff the top 23 bits into a [1, 2) mantissa
    (the standard jax.random.uniform construction)."""
    f = jax.lax.bitcast_convert_type(
        (bits >> np.uint32(9)) | np.uint32(0x3F800000), jnp.float32
    )
    return f - 1.0


def _per_user_uniforms(step_kd: jax.Array, uids: jax.Array, n: int) -> jax.Array:
    """[U_local, n] uniforms keyed by (step key, GLOBAL user id, column).

    One threefry block per (user, column-pair) counter, generated only for
    this shard's ``uids`` — O(U_local) per device, and bit-identical under
    ANY sharding of the user axis (contiguous or not) because the counter is
    the global user id itself. ``step_kd`` is the step's raw uint32[2] key
    data."""
    u_local = uids.shape[0]
    n_pairs = (n + 1) // 2  # each block yields two 32-bit words
    x0 = jnp.broadcast_to(uids.astype(jnp.uint32)[:, None], (u_local, n_pairs))
    x1 = jnp.broadcast_to(
        jnp.arange(n_pairs, dtype=jnp.uint32)[None, :], (u_local, n_pairs)
    )
    w0, w1 = _threefry2x32(step_kd[0], step_kd[1], x0, x1)
    bits = jnp.stack([w0, w1], axis=-1).reshape(u_local, 2 * n_pairs)[:, :n]
    return _bits_to_uniform(bits)


def _sample_pair(
    padded_pos, pos_counts, uids, step_kd, n_items,
    n_tries: int = _NEG_TRIES,
):
    """(step, global-user)-keyed sampling of one (pos, neg) pair per user —
    identical under any sharding of the user axis.

    Same TPU-tuned formulations as models/bpr._sample_pairs: the positive
    slot selects via a one-hot over the history axis (take_along_axis
    row-gathers measured ~7x slower) and the K-way rejection uses 2D
    compares per candidate (one 3D broadcast compare is ~12x slower)."""
    rand = _per_user_uniforms(step_kd, uids, 1 + n_tries)
    u_local, max_len = padded_pos.shape
    slot = (rand[:, 0] * jnp.maximum(pos_counts, 1)).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (u_local, max_len), 1)
    pos = jnp.sum(jnp.where(lane == slot[:, None], padded_pos, 0), axis=1)
    pos = jnp.maximum(pos, 0)
    cand = (rand[:, 1:] * n_items).astype(jnp.int32)
    neg = cand[:, 0]
    ok = jnp.zeros((u_local,), bool)
    for t in range(n_tries):
        c = cand[:, t]
        collides = jnp.any(padded_pos == c[:, None], axis=1)
        take = (~ok) & (~collides)
        neg = jnp.where(take, c, neg)
        ok = ok | (~collides)
    return pos, neg


def _bpr_step_math(
    p, q, padded_pos, pos_counts, uids, step_kd, n_items, lr, reg,
    n_tries: int = _NEG_TRIES,
):
    """Shard-local BPR step on a user shard; returns (p, q_delta, cost).

    Same update rule as models/bpr._bpr_epoch, with sharding-invariant
    sampling.
    """
    active = (pos_counts > 0)[:, None]
    pos, neg = _sample_pair(
        padded_pos, pos_counts, uids, step_kd, n_items, n_tries
    )
    qi = q[pos]
    qj = q[neg]
    diff = jnp.sum(p * (qi - qj), axis=-1)
    cost = jnp.sum(jnp.where(active[:, 0], jax.nn.softplus(-diff), 0.0))
    grad = jnp.where(active, jax.nn.sigmoid(-diff)[:, None], 0.0)
    d_qi = jnp.where(active, lr * (grad * p - reg * qi), 0.0)
    d_qj = jnp.where(active, lr * (-grad * p - reg * qj), 0.0)
    d_pu = jnp.where(active, lr * (grad * (qi - qj) - reg * p), 0.0)
    q_delta = jnp.zeros_like(q).at[pos].add(d_qi).at[neg].add(d_qj)
    return p + d_pu, q_delta, cost


def _raw_step_keys(key: jax.Array, n_steps: int) -> jax.Array:
    """Split ``key`` into per-step raw uint32[2] key data (accepts legacy
    uint32[2] keys and typed key arrays)."""
    keys = jax.random.split(key, n_steps)
    if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
        keys = jax.random.key_data(keys)
    return keys.astype(jnp.uint32)


def make_sharded_bpr_epoch(
    mesh: Mesh, n_steps: int, n_items: int, lr: float, reg: float,
    n_tries: int = _NEG_TRIES, sync_every: int = 1,
):
    """Build a jitted sharded BPR epoch over ``mesh`` (axis ``data`` shards
    users across ALL devices; the ``model`` axis is folded in).

    ``sync_every``: combine item-factor deltas across devices every this
    many steps instead of every step (cuts collective volume by the same
    factor). 1 (default) is exact — results are bit-identical under any
    sharding. >1 is an EXPLICIT semantic variant (local-SGD-style bounded
    staleness: between syncs each device sees only its own item updates) —
    deterministic for a fixed mesh but not sharding-invariant; the
    reference's hogwild goroutines (model/cf/model.go:448-490) provide no
    read consistency at all, so staleness <= sync_every is strictly
    stronger than the architecture being replaced."""
    axes = tuple(mesh.axis_names)
    assert n_steps % sync_every == 0, (n_steps, sync_every)

    def epoch(p, q, padded_pos, pos_counts, uids, key):
        keys = _raw_step_keys(key, n_steps)

        def local_epoch(p, q, padded_pos, pos_counts, uids, keys):
            if sync_every == 1:
                def step(carry, kd):
                    p, q = carry
                    p, q_delta, cost = _bpr_step_math(
                        p, q, padded_pos, pos_counts, uids, kd, n_items, lr,
                        reg, n_tries,
                    )
                    q_delta = jax.lax.psum(q_delta, axes)  # combine item updates
                    return (p, q + q_delta), cost

                (p, q), costs = jax.lax.scan(step, (p, q), keys)
            else:
                def step(carry, kd):
                    p, q_base, q_acc = carry
                    p, q_delta, cost = _bpr_step_math(
                        p, q_base + q_acc, padded_pos, pos_counts, uids, kd,
                        n_items, lr, reg, n_tries,
                    )
                    return (p, q_base, q_acc + q_delta), cost

                def block(carry, kds):
                    p, q = carry
                    # the accumulator is device-varying (local deltas), so
                    # its zero init must carry the varying-axes annotation
                    zero = jax.lax.pcast(jnp.zeros_like(q), axes, to="varying")
                    (p, _, q_acc), costs = jax.lax.scan(step, (p, q, zero), kds)
                    return (p, q + jax.lax.psum(q_acc, axes)), costs

                kblocks = keys.reshape(n_steps // sync_every, sync_every, 2)
                (p, q), costs = jax.lax.scan(block, (p, q), kblocks)
            total = jax.lax.psum(jnp.sum(costs), axes)
            return p, q, total[None]

        return jax.shard_map(
            local_epoch,
            mesh=mesh,
            in_specs=(P(axes, None), P(), P(axes, None), P(axes), P(axes), P()),
            out_specs=(P(axes, None), P(), P()),
        )(p, q, padded_pos, pos_counts, uids, keys)

    return jax.jit(epoch, donate_argnums=(0, 1))


def make_sharded_bpr_epoch_fused(
    mesh: Mesh,
    n_steps: int,
    n_items: int,
    lr: float,
    reg: float,
    interpret: bool = False,
    mm_dtype=jnp.float32,
    n_tries: int = _NEG_TRIES,
    sync_every: int = 1,
):
    """Sharded BPR epoch whose per-device update math runs in the fused
    Pallas kernel (ops/bpr_kernel.bpr_fused_step): counter-based sampling
    keeps samples bit-identical to the XLA sharded epoch, the packed-one-hot
    MXU kernel does the gathers/updates/scatters on each device's user shard,
    and one psum of the packed item-delta per ``sync_every`` steps combines
    devices (see make_sharded_bpr_epoch for the >1 staleness semantics).

    The item table travels packed ([R, 128], ops/bpr_kernel.pack_items), so
    the collective payload equals the dense [I, k] delta. ``interpret=True``
    runs the kernel in interpret mode for CPU meshes (tests, dryrun).
    """
    from ..ops.bpr_kernel import bpr_fused_step

    axes = tuple(mesh.axis_names)
    assert n_steps % sync_every == 0, (n_steps, sync_every)

    def epoch(p, q_packed, padded_pos, pos_counts, uids, key):
        keys = _raw_step_keys(key, n_steps)

        def local_epoch(p, q_packed, padded_pos, pos_counts, uids, keys):
            def kernel_step(p, qp, kd):
                pos, neg = _sample_pair(
                    padded_pos, pos_counts, uids, kd, n_items, n_tries
                )
                return bpr_fused_step(
                    p, qp, pos, neg, pos_counts > 0, lr, reg,
                    interpret=interpret, mm_dtype=mm_dtype,
                )

            if sync_every == 1:
                def step(carry, kd):
                    p, qp = carry
                    p_new, q_delta, cost = kernel_step(p, qp, kd)
                    q_delta = jax.lax.psum(q_delta, axes)
                    return (p_new, qp + q_delta), cost

                (p, q_packed), costs = jax.lax.scan(step, (p, q_packed), keys)
            else:
                def step(carry, kd):
                    p, q_base, q_acc = carry
                    p_new, q_delta, cost = kernel_step(p, q_base + q_acc, kd)
                    return (p_new, q_base, q_acc + q_delta), cost

                def block(carry, kds):
                    p, qp = carry
                    zero = jax.lax.pcast(jnp.zeros_like(qp), axes, to="varying")
                    (p, _, q_acc), costs = jax.lax.scan(step, (p, qp, zero), kds)
                    return (p, qp + jax.lax.psum(q_acc, axes)), costs

                kblocks = keys.reshape(n_steps // sync_every, sync_every, 2)
                (p, q_packed), costs = jax.lax.scan(block, (p, q_packed), kblocks)
            total = jax.lax.psum(jnp.sum(costs), axes)
            return p, q_packed, total[None]

        return jax.shard_map(
            local_epoch,
            mesh=mesh,
            in_specs=(P(axes, None), P(), P(axes, None), P(axes), P(axes), P()),
            out_specs=(P(axes, None), P(), P()),
            # pallas_call's out_shape carries no varying-mesh-axes info
            check_vma=False,
        )(p, q_packed, padded_pos, pos_counts, uids, keys)

    return jax.jit(epoch, donate_argnums=(0, 1))



def place_global(mesh: Mesh, host_array, spec) -> jax.Array:
    """Place host data onto ``mesh`` with ``spec`` via
    ``make_array_from_callback`` — works on single-process meshes AND on
    jax.distributed global meshes where this process only addresses its own
    devices (each host holds the identical full array and contributes its
    addressable shards; ``jax.device_put`` would reject non-addressable
    placements)."""
    host_array = np.asarray(host_array)
    return jax.make_array_from_callback(
        host_array.shape, NamedSharding(mesh, spec), lambda idx: host_array[idx]
    )


def shard_bpr_inputs(mesh: Mesh, user_factors, item_factors, padded_pos, pos_counts):
    """Pad the user axis to the device count and place inputs with the
    epoch's shardings. Returns (p, q, padded_pos, counts, uids, n_users)."""
    n_dev = mesh.size
    axes = tuple(mesh.axis_names)
    n_users = user_factors.shape[0]
    pad = (-n_users) % n_dev

    def pad_rows(x, fill):
        if pad == 0:
            return np.asarray(x)
        return np.concatenate(
            [np.asarray(x), np.full((pad,) + x.shape[1:], fill, dtype=x.dtype)], axis=0
        )

    def place(host_array, spec):
        return place_global(mesh, host_array, spec)

    uids = np.arange(n_users + pad, dtype=np.int32)
    p = place(pad_rows(np.asarray(user_factors), 0.0), P(axes, None))
    q = place(np.asarray(item_factors), P())
    pp = place(pad_rows(np.asarray(padded_pos), -1), P(axes, None))
    pc = place(pad_rows(np.asarray(pos_counts, dtype=np.int32), 0), P(axes))
    uid_arr = place(uids, P(axes))
    return p, q, pp, pc, uid_arr, n_users


def make_sharded_als_epoch(mesh: Mesh, block: int, alpha: float, reg: float):
    """Build a jitted sharded eALS epoch: user rows and item rows are sharded
    over all mesh devices; each half-epoch is the embarrassingly parallel
    per-row weighted ridge solve (models/als._als_solve_rows) on the local
    row shard, followed by one tiled ``all_gather`` so the other side solves
    against the full updated table.

    The Gram matrix for the alpha-weighted missing-entry term is computed
    from the replicated full table (identical on every device), masked to
    feedback-bearing rows — the reference skips feedback-less rows when
    accumulating S (model/cf/model.go:646-659) — so results match the
    single-device epoch up to FP reduction order: sharding changes the
    schedule, not the math (verified in tests/test_sharded.py).

    Inputs from :func:`shard_als_inputs`: ``user_mask``/``item_mask`` are
    replicated [U_pad]/[I_pad] f32 has-feedback masks; padding rows (count
    0) solve to the zero vector.
    """
    from ..models.als import _als_solve_rows

    axes = tuple(mesh.axis_names)

    def epoch(q, user_fb, item_fb, user_mask, item_mask):
        def local(q, user_fb_shard, item_fb_shard, umask, imask):
            qm = q * imask[:, None]
            gram_q = qm.T @ qm
            p_shard = _als_solve_rows(q, user_fb_shard, block, alpha, reg, gram_q)
            p = jax.lax.all_gather(p_shard, axes, tiled=True)  # [U_pad, k]
            pm = p * umask[:, None]
            gram_p = pm.T @ pm
            q_shard = _als_solve_rows(p, item_fb_shard, block, alpha, reg, gram_p)
            q = jax.lax.all_gather(q_shard, axes, tiled=True)  # [I_pad, k]
            return p, q

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axes, None), P(axes, None), P(), P()),
            out_specs=(P(), P()),
            # outputs are replicated by the final tiled all_gathers
            check_vma=False,
        )(q, user_fb, item_fb, user_mask, item_mask)

    return jax.jit(epoch)


def shard_als_inputs(mesh: Mesh, item_factors, user_fb, item_fb, block: int):
    """Pad both feedback tables' row axes to a multiple of mesh.size * block
    (so every device's shard splits into whole solve blocks) and place them
    row-sharded; the item table starts replicated, as do the two
    has-feedback Gram masks (see :func:`make_sharded_als_epoch`).

    Returns (q, user_fb, item_fb, user_mask, item_mask, n_users, n_items)."""
    axes = tuple(mesh.axis_names)
    multiple = mesh.size * block

    def pad_rows(x):
        x = np.asarray(x)
        pad = (-x.shape[0]) % multiple
        if pad == 0:
            return x
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], -1, dtype=x.dtype)], axis=0
        )

    ufb_np, ifb_np = pad_rows(user_fb), pad_rows(item_fb)
    # pad the replicated item table to the SAME row multiple as item_fb:
    # the epoch returns q at the padded length (all_gather of padded-row
    # solves), so the table and its Gram mask must be padded-length from
    # epoch 1 onward (padding rows solve to zero and the mask excludes them)
    q_np = np.asarray(item_factors)
    q_pad = (-q_np.shape[0]) % multiple
    if q_pad:
        q_np = np.concatenate(
            [q_np, np.zeros((q_pad, q_np.shape[1]), q_np.dtype)], axis=0
        )
    q = place_global(mesh, q_np, P())
    ufb = place_global(mesh, ufb_np, P(axes, None))
    ifb = place_global(mesh, ifb_np, P(axes, None))
    umask = place_global(mesh, (ufb_np[:, 0] >= 0).astype(np.float32), P())
    imask = place_global(mesh, (ifb_np[:, 0] >= 0).astype(np.float32), P())
    return (
        q, ufb, ifb, umask, imask,
        np.asarray(user_fb).shape[0], np.asarray(item_fb).shape[0],
    )


def shard_afm_batches(mesh: Mesh, batches: tuple):
    """Place an AFM epoch's [S, B, ...] batch stacks with the batch axis (B)
    sharded over all mesh devices — pure data parallelism. Model parameters
    stay replicated; under ``jit`` XLA's SPMD partitioner inserts the
    gradient ``psum`` (the "annotate shardings, let XLA insert collectives"
    recipe, SURVEY.md §7). B must be divisible by mesh.size.

    ``batches`` is models/fm.AFM._batch output:
    (indices, values, targets, weights, embeddings-tuple).
    """
    axes = tuple(mesh.axis_names)

    def put(x):
        assert x.shape[1] % mesh.size == 0, (
            f"batch axis {x.shape[1]} not divisible by mesh size {mesh.size}"
        )
        spec = P(None, axes) + (None,) * (x.ndim - 2)
        return place_global(mesh, x, P(*spec))

    idx, val, tgt, wgt, embs = batches
    return put(idx), put(val), put(tgt), put(wgt), tuple(put(e) for e in embs)


def replicate(mesh: Mesh, tree):
    """Place every leaf of ``tree`` fully replicated over ``mesh``."""
    return jax.tree.map(lambda x: place_global(mesh, x, P()), tree)


def make_sharded_topk(mesh: Mesh, k_top: int):
    """Item-sharded exact top-k: each device ranks its item shard, results
    are all-gathered and merged (partial top-k + merge)."""
    axes = tuple(mesh.axis_names)

    def topk(queries, items):  # queries replicated, items row-sharded
        n_dev = mesh.size
        shard_size = items.shape[0] // n_dev

        def local(queries, items_shard, shard_idx):
            scores = jnp.dot(queries, items_shard.T, preferred_element_type=jnp.float32)
            k_local = min(k_top, items_shard.shape[0])
            s, i = jax.lax.top_k(scores, k_local)
            i = i + shard_idx[0] * shard_size
            # gather every shard's candidates, merge locally (replicated out)
            all_s = jax.lax.all_gather(s, axes, tiled=False)  # [D, B, k]
            all_i = jax.lax.all_gather(i, axes, tiled=False)
            d = all_s.shape[0]
            all_s = jnp.moveaxis(all_s, 0, 1).reshape(queries.shape[0], d * k_local)
            all_i = jnp.moveaxis(all_i, 0, 1).reshape(queries.shape[0], d * k_local)
            ms, mi = jax.lax.top_k(all_s, k_top)
            gi = jnp.take_along_axis(all_i, mi, axis=1)
            return ms, gi

        shard_ids = place_global(mesh, np.arange(mesh.size, dtype=np.int32), P(axes))
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axes, None), P(axes)),
            out_specs=(P(), P()),
            check_vma=False,  # outputs are replicated by the final merge
        )(queries, items, shard_ids)

    return jax.jit(topk)
