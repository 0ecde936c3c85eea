"""Fused Pallas kernel for the BPR pairwise update.

The XLA dense-over-users epoch (models/bpr.py) is bottlenecked by the two
item-table scatter-adds and the item-row gathers — XLA lowers them to slow
serialized scatter/gather loops (~100M rows/s measured). This kernel turns
both into full-utilization MXU matmuls via a *packed* item layout:

    q_packed[r, :]  holds  P = 128 // k  consecutive items' factors,
    item i lives at row i // P, lanes (i % P) * k : (i % P + 1) * k.

Per user block the kernel builds a one-hot [TB, I/P] over packed rows
on the fly IN VMEM (never materialized to HBM):

    gather:  onehot @ q_packed        -> [TB, 128], lane-group select -> q_i
    scatter: onehot^T @ delta_packed  -> [I/P, 128] accumulated in scratch

so the FLOPs land on the 128-wide MXU instead of 16-wide scatter rows.
The grid walks user blocks sequentially; the q-delta accumulator lives in
VMEM scratch and is written once at the last block.

Used by models/bpr.py on TPU when k divides 128; parity with the XLA path is
tested in interpret mode (tests/test_bpr_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_items(q: jax.Array) -> jax.Array:
    """[I, k] -> packed [I_pad/P, 128] with P = 128//k consecutive items per
    row (k must divide 128)."""
    n_items, k = q.shape
    assert LANES % k == 0, f"k={k} must divide {LANES}"
    p = LANES // k
    rows = _round_up(n_items, p) // p
    padded = jnp.zeros((rows * p, k), q.dtype).at[:n_items].set(q)
    return padded.reshape(rows, LANES)


def unpack_items(q_packed: jax.Array, n_items: int, k: int) -> jax.Array:
    p = LANES // k
    return q_packed.reshape(-1, k)[:n_items]


def _kernel_sample_pair(pp, pc, block_u, max_len, n_items, n_tries, ablate=""):
    """On-chip PRNG (pos, neg) pair per user of a block — shared by the
    fully-fused and epoch-resident kernels. Positive: uniform slot in
    [0, count) selected one-hot from the padded positives; negative: K-way
    rejection against pp (first non-colliding draw wins; if all K collide,
    fall back to the first draw — the XLA path's semantics, probability
    ~ density**K).

    All 1 + n_tries draws come from ONE batched prng_random_bits call.
    Measured NEUTRAL on the r4 ablation rig (full epoch 45.2 ms with five
    [TB, 1] PRNG ops vs 46.0 ms batched, same window — within noise): the
    separate PRNG ops were already cheap. Kept for the simpler op stream;
    the study's sampling-cost attribution lives in docs/KERNELS.md."""
    n_draws = 1 + n_tries
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((block_u, n_draws)), jnp.uint32
    )  # one PRNG op for every draw of the block
    # bits -> uniforms in [0, 1) via the mantissa trick, then scale: integer
    # modulo has no VPU hardware (lowers to a long shift-subtract sequence,
    # and `bits % pc` divides by a PER-USER variable) — the float path is a
    # handful of cheap ops and exact for ranges < 2^24 (docs/KERNELS.md r4
    # ablation study: sampling was 26% of the resident epoch, over half of
    # it in the modulo-fed positive-slot select)
    u01 = pltpu.bitcast(
        (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000), jnp.float32
    ) - 1.0  # [TB, n_draws] in [0, 1)
    if ablate == "samp_nopos":  # cost attribution: skip the slot one-hot
        pos = jnp.maximum(pp[:, 0:1], 0)
    else:
        slot = (u01[:, 0:1] * jnp.maximum(pc, 1).astype(jnp.float32)).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (block_u, max_len), 1)
        pos = jnp.sum(jnp.where(lane == slot, pp, 0), axis=1, keepdims=True)
        pos = jnp.maximum(pos, 0)  # [TB, 1]

    cand = (u01[:, 1:] * jnp.float32(n_items)).astype(jnp.int32)  # [TB, K]
    if ablate == "samp_norej":  # cost attribution: skip collision compares
        return pos, cand[:, 0:1]
    neg = jnp.zeros((block_u, 1), jnp.int32)
    first_draw = cand[:, 0:1]
    ok = jnp.zeros((block_u, 1), jnp.bool_)
    for t in range(n_tries):
        c = cand[:, t : t + 1]
        collides = jnp.any(pp == c, axis=1, keepdims=True)
        take = jnp.logical_and(jnp.logical_not(ok), jnp.logical_not(collides))
        neg = jnp.where(take, c, neg)
        ok = jnp.logical_or(ok, jnp.logical_not(collides))
    return pos, jnp.where(ok, neg, first_draw)


def _pairwise_math(pos, neg, active, p, g_pos, g_neg, cost, *, k, lr, reg, block_u):
    """The BPR pairwise update arithmetic on lane-dense [TB, 128] gathers
    (g_pos/g_neg = packed rows holding the pos/neg item factors in one lane
    group). Returns (d_pu [TB, k], dp_pos, dp_neg [TB, 128] group-masked
    scatter payloads, cost). Shared by the full-R one-hot kernels; op order
    is identical to the committed r1 kernels so their numerics are
    unchanged."""
    pack = LANES // k
    if pack == 1:
        qi_big, qj_big = g_pos, g_neg
        p8 = p
    else:
        group = jax.lax.broadcasted_iota(jnp.int32, (block_u, LANES), 1) // k
        qi_big = g_pos * (group == pos % pack)  # [TB, 128], zero off-group
        qj_big = g_neg * (group == neg % pack)
        p8 = jnp.concatenate([p] * pack, axis=1)  # [TB, 128] replicated

    diff = (
        jnp.sum(p8 * qi_big, axis=-1, keepdims=True)
        - jnp.sum(p8 * qj_big, axis=-1, keepdims=True)
    )  # [TB, 1]
    cost = cost + jnp.sum(active * jnp.logaddexp(0.0, -diff))
    grad = active * jax.nn.sigmoid(-diff)  # [TB, 1]
    dp_pos = active * (lr * (grad * p8 - reg * qi_big))  # [TB, 128]
    dp_neg = active * (lr * (-grad * p8 - reg * qj_big))
    if pack == 1:
        d_big = qi_big - qj_big
    else:
        group_mask = group == pos % pack
        dp_pos = dp_pos * group_mask
        dp_neg = dp_neg * (group == neg % pack)
        d_big = qi_big - qj_big
        fold = d_big[:, :k]
        for g in range(1, pack):
            fold = fold + d_big[:, g * k:(g + 1) * k]
        d_big = fold
    d_pu = active * (lr * (grad * d_big - reg * p))
    return d_pu, dp_pos, dp_neg, cost


def _kernel_block_update(
    pos, neg, active, p, qp_mm, qd, cost,
    *, k, lr, reg, block_u, rows_pad, mm_dtype, transposed_scatter,
    ablate: str = "",
):
    """The packed one-hot gather / BPR update / scatter-delta block shared
    by all three kernels. Returns (p_new, qd, cost).

    ``transposed_scatter`` selects how the scatter one-hots reach the MXU:
    the epoch-resident kernel builds TRANSPOSED one-hots directly by
    iota-compare (a fresh compare is free; transposing the [TB, R] one-hot
    is not), the grid kernels contract the gather one-hots on dim 0 — kept
    per-kernel so numerics match their committed baselines exactly.

    All per-user math is kept LANE-DENSE on [TB, 128] with lane-group masks
    (narrow [TB, k] intermediates only for the user-factor fold/update):
    narrow ops occupy k of 128 VPU lanes, and the previous [TB, k]
    formulation spent ~8x its arithmetic in idle lanes — switching to masked
    [TB, 128] ops measured 1.26x on the whole epoch at ml-1m shapes."""
    pack = LANES // k
    if ablate == "nogather":
        # profiling instrument (docs/KERNELS.md): skip the one-hot build +
        # gather matmuls, read a broadcast row instead — results are WRONG,
        # only the timing delta is meaningful
        g_pos = jnp.broadcast_to(qp_mm[0:1].astype(jnp.float32), (block_u, LANES))
        g_neg = g_pos
    else:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_u, rows_pad), 1)
        oh_pos = (row_ids == pos // pack).astype(mm_dtype)  # [TB, R]
        oh_neg = (row_ids == neg // pack).astype(mm_dtype)
        g_pos = jnp.dot(oh_pos, qp_mm, preferred_element_type=jnp.float32)  # [TB, 128]
        g_neg = jnp.dot(oh_neg, qp_mm, preferred_element_type=jnp.float32)

    d_pu, dp_pos, dp_neg, cost = _pairwise_math(
        pos, neg, active, p, g_pos, g_neg, cost, k=k, lr=lr, reg=reg, block_u=block_u
    )
    if ablate == "noscatter":
        return p + d_pu, qd + jnp.float32(1e-12), cost
    if transposed_scatter:
        row_ids_t = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, block_u), 0)
        oh_pos_t = (row_ids_t == jnp.transpose(pos // pack)).astype(mm_dtype)
        oh_neg_t = (row_ids_t == jnp.transpose(neg // pack)).astype(mm_dtype)
        qd = qd + jnp.dot(
            oh_pos_t, dp_pos.astype(mm_dtype), preferred_element_type=jnp.float32
        )
        qd = qd + jnp.dot(
            oh_neg_t, dp_neg.astype(mm_dtype), preferred_element_type=jnp.float32
        )
    else:
        qd = qd + jax.lax.dot_general(
            oh_pos, dp_pos.astype(mm_dtype), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qd = qd + jax.lax.dot_general(
            oh_neg, dp_neg.astype(mm_dtype), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return p + d_pu, qd, cost


def _fused_kernel(
    pos_ref, neg_ref, active_ref, p_ref, qp_ref,
    p_out_ref, qd_out_ref, cost_ref,
    *, k: int, lr: float, reg: float, block_u: int, rows_pad: int, mm_dtype, n_blocks: int,
):
    """Single pallas invocation; internal fori_loop over user blocks keeps
    the q-delta accumulator live in VMEM with no per-block grid overhead."""
    qp_mm = qp_ref[:].astype(mm_dtype)

    def body(blk, carry):
        qd, cost = carry
        sl = pl.ds(blk * block_u, block_u)
        p_new, qd, cost = _kernel_block_update(
            pos_ref[sl, :], neg_ref[sl, :],
            active_ref[sl, :].astype(jnp.float32), p_ref[sl, :], qp_mm, qd, cost,
            k=k, lr=lr, reg=reg, block_u=block_u, rows_pad=rows_pad,
            mm_dtype=mm_dtype, transposed_scatter=False,
        )
        p_out_ref[sl, :] = p_new
        return qd, cost

    qd0 = jnp.zeros((rows_pad, LANES), jnp.float32)
    qd, cost = jax.lax.fori_loop(0, n_blocks, body, (qd0, jnp.float32(0.0)))
    qd_out_ref[:] = qd
    cost_ref[0, 0] = cost


@functools.partial(jax.jit, static_argnames=("lr", "reg", "block_u", "interpret", "mm_dtype"))
def bpr_fused_step(
    p: jax.Array,  # [U, k] user factors (U padded to block_u multiple)
    q_packed: jax.Array,  # [R, 128] packed item factors (R mult of 8)
    pos: jax.Array,  # [U] int32
    neg: jax.Array,  # [U] int32
    active: jax.Array,  # [U] bool/int32
    lr: float,
    reg: float,
    block_u: int = 512,
    interpret: bool = False,
    mm_dtype=jnp.float32,
):
    """One fused BPR pairwise sweep. Returns (p_new, q_delta_packed, cost)."""
    n_users, k = p.shape
    rows = q_packed.shape[0]
    rows_pad = _round_up(rows, 8)
    u_pad = _round_up(n_users, block_u)
    qp = jnp.zeros((rows_pad, LANES), jnp.float32).at[:rows].set(q_packed)
    pp = jnp.zeros((u_pad, k), jnp.float32).at[:n_users].set(p)
    pos_p = jnp.zeros((u_pad, 1), jnp.int32).at[:n_users, 0].set(pos)
    neg_p = jnp.zeros((u_pad, 1), jnp.int32).at[:n_users, 0].set(neg)
    act_p = jnp.zeros((u_pad, 1), jnp.int32).at[:n_users, 0].set(active.astype(jnp.int32))

    n_blocks = u_pad // block_u
    p_new, q_delta, cost = pl.pallas_call(
        functools.partial(
            _fused_kernel, k=k, lr=lr, reg=reg, block_u=block_u,
            rows_pad=rows_pad, mm_dtype=mm_dtype, n_blocks=n_blocks,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(pos_p, neg_p, act_p, pp, qp)
    return p_new[:n_users], q_delta[:rows], cost[0, 0]


def _fully_fused_kernel(
    seed_ref, pp_ref, pc_ref, p_ref, qp_ref,
    p_out_ref, qd_out_ref, cost_ref, pos_out_ref, neg_out_ref,
    qd_scratch, cost_scratch,
    *, k: int, n_items: int, lr: float, reg: float,
    block_u: int, rows_pad: int, max_len: int, mm_dtype, n_tries: int,
):
    """Everything in one kernel: on-chip PRNG sampling (positive slot +
    K-way rejected negative) over the user block's padded positives, then the
    packed gather/update/scatter of _fused_kernel. The grid walks user
    blocks — only the current block's positives/factors are in VMEM (the
    pipeline double-buffers them), so the kernel scales to any user count;
    the packed item table + delta accumulator stay resident."""
    pack = LANES // k
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        pltpu.prng_seed(seed_ref[0])  # stream continues across grid steps
        qd_scratch[:] = jnp.zeros_like(qd_scratch)
        cost_scratch[0, 0] = 0.0

    qp_mm = qp_ref[:].astype(mm_dtype)
    pc = pc_ref[:]  # [TB, 1]
    pp = pp_ref[:]  # [TB, L]
    pos, neg = _kernel_sample_pair(pp, pc, block_u, max_len, n_items, n_tries)
    pos_out_ref[:] = pos
    neg_out_ref[:] = neg
    p_new, qd, cost = _kernel_block_update(
        pos, neg, (pc > 0).astype(jnp.float32), p_ref[:], qp_mm,
        qd_scratch[:], cost_scratch[0, 0],
        k=k, lr=lr, reg=reg, block_u=block_u, rows_pad=rows_pad,
        mm_dtype=mm_dtype, transposed_scatter=False,
    )
    p_out_ref[:] = p_new
    qd_scratch[:] = qd
    cost_scratch[0, 0] = cost

    @pl.when(blk == pl.num_programs(0) - 1)
    def _():
        qd_out_ref[:] = qd_scratch[:]
        cost_ref[0, 0] = cost_scratch[0, 0]


def _epoch_resident_kernel(
    seed_ref, pp_ref, pc_ref, p_ref, qp_ref,
    p_out_ref, qp_out_ref, cost_ref,
    qd_scratch,
    *, k: int, n_items: int, lr: float, reg: float,
    block_u: int, rows_pad: int, max_len: int, mm_dtype, n_tries: int,
    n_steps: int, n_blocks: int, ablate: str = "",
):
    """A WHOLE epoch in one kernel invocation: positives, counts, user
    factors, and the packed item table all stay resident in VMEM across an
    internal (step, block) loop nest. Eliminates the per-step pallas_call
    dispatch + pipeline prologue and the per-step HBM reload of the padded
    positives (the dominant cost at ml-1m scale: ~165 dispatches and ~1 GB
    of repeated positive-table traffic per epoch in the grid-form kernel).
    Item deltas accumulate per sweep and fold into the resident table at
    each step boundary, matching _fully_fused_kernel's semantics.

    ``ablate`` ("" | "nosample" | "nogather" | "noscatter" | "scatter_dim0")
    disables one stage for cost attribution (docs/KERNELS.md records the
    measurements) — ablated results are numerically WRONG by design."""
    pltpu.prng_seed(seed_ref[0])
    p_out_ref[:] = p_ref[:]
    qp_out_ref[:] = qp_ref[:]

    def step_body(_s, cost):
        qd_scratch[:] = jnp.zeros_like(qd_scratch)
        qp_mm = qp_out_ref[:].astype(mm_dtype)

        def one_block(b, qd, cost):
            sl = pl.ds(b * block_u, block_u)
            pp = pp_ref[sl, :]
            count = pc_ref[sl, :]
            if ablate == "nosample":
                pos = jnp.maximum(pp[:, 0:1], 0)
                neg = (pos + 37) % jnp.int32(n_items)
            else:
                pos, neg = _kernel_sample_pair(
                    pp, count, block_u, max_len, n_items, n_tries, ablate=ablate
                )
            p_new, qd, cost = _kernel_block_update(
                pos, neg, (count > 0).astype(jnp.float32), p_out_ref[sl, :],
                qp_mm, qd, cost,
                k=k, lr=lr, reg=reg, block_u=block_u, rows_pad=rows_pad,
                mm_dtype=mm_dtype,
                transposed_scatter=(ablate != "scatter_dim0"),
                ablate=ablate,
            )
            p_out_ref[sl, :] = p_new
            return qd, cost

        qd0 = jnp.zeros((rows_pad, LANES), jnp.float32)

        # Attempted and REJECTED (r4): unrolling two independent block
        # chains per loop iteration (same math — a step's blocks share one
        # qp snapshot and only meet in qd) to hand the scheduler VPU/MXU
        # overlap material. Measured neutral-to-worse interleaved in one
        # window (full 36.3/36.7 vs unroll2 37.0/38.1 ms/epoch) — Mosaic
        # already software-pipelines the loop body.
        def blk_body(b, carry):
            qd, cost = carry
            return one_block(b, qd, cost)

        qd, cost = jax.lax.fori_loop(0, n_blocks, blk_body, (qd0, cost))
        qp_out_ref[:] = qp_out_ref[:] + qd  # sweep boundary: fold deltas in
        return cost

    cost = jax.lax.fori_loop(0, n_steps, step_body, jnp.float32(0.0))
    cost_ref[0, 0] = cost


# conservative VMEM budget for the epoch-resident kernel (bytes); v5e scoped
# vmem limit is 16 MiB — leave headroom for compiler temporaries
_EPOCH_RESIDENT_VMEM_BUDGET = 11 * 1024 * 1024


def epoch_resident_vmem_bytes(n_users: int, max_len: int, rows: int, k: int, block_u: int = 512) -> int:
    """Estimated resident VMEM for bpr_epoch_fused (used by the fit guard)."""
    u_pad = _round_up(n_users, block_u)
    rows_pad = _round_up(rows, 8)
    ml = _round_up(max_len, LANES)
    return (
        u_pad * ml * 4          # padded positives
        + u_pad * 4              # counts (padded lane)
        + 2 * u_pad * k * 4      # p in + out
        + 3 * rows_pad * LANES * 4  # qp in + out + delta scratch
    )


def fits_epoch_resident(n_users: int, max_len: int, rows: int, k: int) -> bool:
    return epoch_resident_vmem_bytes(n_users, max_len, rows, k) <= _EPOCH_RESIDENT_VMEM_BUDGET


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "n_items", "lr", "reg", "block_u", "interpret", "mm_dtype", "n_tries", "ablate"),
)
def bpr_epoch_fused(
    p: jax.Array,  # [U, k]
    q_packed: jax.Array,  # [R, 128]
    padded_pos: jax.Array,  # [U, L] int32, pad=-1
    pos_counts: jax.Array,  # [U] int32
    seed: jax.Array,  # [1] int32 per-epoch seed
    n_steps: int,
    n_items: int,
    lr: float,
    reg: float,
    block_u: int = 512,
    interpret: bool = False,
    mm_dtype=jnp.bfloat16,
    n_tries: int = 4,  # matches models/bpr._NEG_TRIES (the XLA sampler)
    ablate: str = "",  # profiling instrument, see _epoch_resident_kernel
):
    """A full BPR epoch (n_steps sweeps) in ONE kernel invocation.
    Returns (p_new, q_packed_new, cost). Use fits_epoch_resident() first."""
    n_users, k = p.shape
    max_len = _round_up(padded_pos.shape[1], LANES)
    rows = q_packed.shape[0]
    rows_pad = _round_up(rows, 8)
    u_pad = _round_up(n_users, block_u)
    qp = jnp.zeros((rows_pad, LANES), jnp.float32).at[:rows].set(q_packed)
    pp_arr = (
        jnp.full((u_pad, max_len), -1, jnp.int32)
        .at[:n_users, : padded_pos.shape[1]]
        .set(padded_pos)
    )
    pc_arr = jnp.zeros((u_pad, 1), jnp.int32).at[:n_users, 0].set(pos_counts)
    p_arr = jnp.zeros((u_pad, k), jnp.float32).at[:n_users].set(p)

    p_new, qp_new, cost = pl.pallas_call(
        functools.partial(
            _epoch_resident_kernel, k=k, n_items=n_items, lr=lr, reg=reg,
            block_u=block_u, rows_pad=rows_pad, max_len=max_len,
            mm_dtype=mm_dtype, n_tries=n_tries,
            n_steps=n_steps, n_blocks=u_pad // block_u, ablate=ablate,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((rows_pad, LANES), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), pp_arr, pc_arr, p_arr, qp)
    return p_new[:n_users], qp_new[:rows], cost[0, 0]


# RETIRED (r3): the streamed large-catalog kernel (_streamed_step_kernel /
# bpr_streamed_step / bpr_epoch_streamed) kept the packed item table
# HBM-resident and blocked its one-hot gather/scatter matmuls over item
# rows. Its one-hot matmuls did O(users x packed_rows) work per sweep, and
# it measured 10.9M examples/s at the ml-20m shape (k=64) vs 40.8M for the
# XLA scatter path (models/bpr._bpr_epoch) on v5e — 3.7x slower with no
# winning regime at any tested shape (also 19M vs 26M at 100k x 50k). The
# XLA scatter path is the chosen large-catalog design: its gather/scatter
# cost scales with ACTIVE users, not catalog size (VERDICT r2 next #4).


@functools.partial(
    jax.jit,
    static_argnames=("n_items", "lr", "reg", "block_u", "interpret", "mm_dtype", "n_tries"),
)
def bpr_fully_fused_step(
    p: jax.Array,  # [U, k]
    q_packed: jax.Array,  # [R, 128]
    padded_pos: jax.Array,  # [U, L] int32, pad=-1
    pos_counts: jax.Array,  # [U] int32
    seed: jax.Array,  # [1] int32 per-step seed
    n_items: int,
    lr: float,
    reg: float,
    block_u: int = 512,
    interpret: bool = False,
    mm_dtype=jnp.float32,
    n_tries: int = 4,  # matches models/bpr._NEG_TRIES (the XLA sampler)
):
    """One BPR sweep with in-kernel sampling. Returns
    (p_new, q_delta_packed, cost, pos, neg)."""
    n_users, k = p.shape
    max_len = _round_up(padded_pos.shape[1], LANES)  # VMEM slice alignment
    rows = q_packed.shape[0]
    rows_pad = _round_up(rows, 8)
    u_pad = _round_up(n_users, block_u)
    qp = jnp.zeros((rows_pad, LANES), jnp.float32).at[:rows].set(q_packed)
    pp_arr = (
        jnp.full((u_pad, max_len), -1, jnp.int32)
        .at[:n_users, : padded_pos.shape[1]]
        .set(padded_pos)
    )
    pc_arr = jnp.zeros((u_pad, 1), jnp.int32).at[:n_users, 0].set(pos_counts)
    p_arr = jnp.zeros((u_pad, k), jnp.float32).at[:n_users].set(p)

    n_blocks = u_pad // block_u
    p_new, q_delta, cost, pos, neg = pl.pallas_call(
        functools.partial(
            _fully_fused_kernel, k=k, n_items=n_items, lr=lr, reg=reg,
            block_u=block_u, rows_pad=rows_pad, max_len=max_len,
            mm_dtype=mm_dtype, n_tries=n_tries,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_u, max_len), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_pad, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_u, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_pad, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_u, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((u_pad, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_pad, LANES), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), pp_arr, pc_arr, p_arr, qp)
    return p_new[:n_users], q_delta[:rows], cost[0, 0], pos[:n_users, 0], neg[:n_users, 0]
