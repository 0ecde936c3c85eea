"""Exact blocked dot-product top-k retrieval.

Covers the reference's MF serving index (logics/cf.go:36-124 — brute-force
dot top-k over item factors) and replaces common/ann HNSW: on TPU, exact
blocked top-k is cheaper than approximate graph search at gorse's scales and
returns exact results (SURVEY.md §7 design stance).

Two implementations with identical semantics:

- ``dot_topk_xla``: jnp.dot + lax.top_k (materializes [B, N] scores in HBM);
- ``dot_topk``: a Pallas kernel that streams item blocks HBM->VMEM, does the
  [B, blk] matmul on the MXU, and folds each block into a SORTED running
  top-k in VMEM scratch behind a threshold gate: once the running k-th best
  beats a block's maximum, the fold costs one max-reduce (the common case
  after warm-up) — the [B, N] score matrix never exists in HBM. Measured
  ~2-2.5x the XLA path at every catalog size (427k vs 202k q/s at 100k
  items, 50k vs 20k q/s at 1M items; batch 256, d=64, k=10, 1 chip).

The grid iterates sequentially over item blocks on TPU, which is what makes
the VMEM scratch accumulator correct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def dot_topk_xla(queries: jax.Array, items: jax.Array, k_top: int):
    """Reference implementation: full score matrix + lax.top_k."""
    scores = jnp.dot(queries, items.T, preferred_element_type=jnp.float32)
    top_scores, top_idx = jax.lax.top_k(scores, k_top)
    return top_scores, top_idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k_top", "metric"))
def sq_topk(
    queries: jax.Array,
    codes: jax.Array,
    scale: jax.Array,
    minv: jax.Array,
    k_top: int,
    norms2: jax.Array | None = None,
    metric: str = "dot",
):
    """Top-k over scalar-quantized vectors, dequantized *inside* the matmul.

    Rows are stored as uint8 codes with per-row affine params
    (``v = minv + scale * codes``), so exact dot products follow from one
    int8-input matmul plus rank-1 corrections:

        q . v = scale * (q . codes) + minv * sum(q)

    The codes upcast to bf16 on the MXU — 4x less HBM traffic than f32
    rows. ``metric``: "dot" | "cosine" (rows pre-normalized at ingest) |
    "euclidean" (needs ``norms2 = ||v||^2``; returns negative distances so
    larger is always better).
    """
    q = queries.astype(jnp.float32)
    partial = jnp.dot(
        q, codes.astype(jnp.bfloat16).T, preferred_element_type=jnp.float32
    )
    dots = partial * scale[None, :] + jnp.sum(q, axis=1, keepdims=True) * minv[None, :]
    if metric == "euclidean":
        q2 = jnp.sum(q * q, axis=1, keepdims=True)
        scores = -(q2 - 2.0 * dots + norms2[None, :])
    else:
        scores = dots
    top_scores, top_idx = jax.lax.top_k(scores, k_top)
    return top_scores, top_idx.astype(jnp.int32)


def _topk_kernel(q_ref, item_ref, out_s_ref, out_i_ref, run_s, run_i, *, k_sel, block_n, n_items):
    """One grid step: fold item block ``pl.program_id(0)`` into the running
    top-k, which is kept SORTED (descending) in VMEM scratch.

    The fold is threshold-gated: a block only pays for extraction while its
    remaining maximum still beats some query's current k-th best. After the
    running top-k warms up (a few blocks), almost every block exits the
    while_loop after ONE cheap max-reduce — the fold cost approaches one
    pass per block instead of k passes, leaving the matmul/HBM stream as
    the bottleneck."""
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        run_s[:] = jnp.full_like(run_s, NEG_INF)
        run_i[:] = jnp.zeros_like(run_i)

    # [B, blk_n] scores on the MXU
    scores = jax.lax.dot_general(
        q_ref[:], item_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    base = blk * block_n
    b = scores.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, block_n), 1) + base
    scores = jnp.where(col_ids < n_items, scores, NEG_INF)  # tail padding

    lane = jax.lax.broadcasted_iota(jnp.int32, run_s.shape, 1)  # [B, k_pad]

    def cond(state):
        scores, rs, _, it = state
        kth = rs[:, k_sel - 1 : k_sel]  # [B, 1] current k-th best
        return jnp.logical_and(
            it < k_sel, jnp.any(jnp.max(scores, axis=1, keepdims=True) > kth)
        )

    def body(state):
        scores, rs, ri, it = state
        v = jnp.max(scores, axis=1, keepdims=True)  # [B, 1]
        kth = rs[:, k_sel - 1 : k_sel]
        active = v > kth  # queries whose top-k changes this pass
        # first-occurrence extraction without argmax: min column id at max
        at_max = scores == v
        idx = jnp.min(
            jnp.where(at_max, col_ids, jnp.int32(2**31 - 1)), axis=1, keepdims=True
        )
        # consume the extracted element everywhere (it can never re-enter)
        scores = jnp.where(jnp.logical_and(at_max, col_ids == idx), NEG_INF, scores)
        # sorted insertion: elements >= v keep their lane, the rest shift right
        nge = jnp.sum((rs >= v).astype(jnp.int32), axis=1, keepdims=True)  # [B, 1]
        prev_s = jnp.concatenate([rs[:, :1], rs[:, :-1]], axis=1)  # shift right
        prev_i = jnp.concatenate([ri[:, :1], ri[:, :-1]], axis=1)
        new_s = jnp.where(lane < nge, rs, jnp.where(lane == nge, v, prev_s))
        new_i = jnp.where(lane < nge, ri, jnp.where(lane == nge, idx, prev_i))
        rs = jnp.where(active, new_s, rs)
        ri = jnp.where(active, new_i, ri)
        return scores, rs, ri, it + 1

    _, rs, ri, _ = jax.lax.while_loop(
        cond, body, (scores, run_s[:], run_i[:], jnp.int32(0))
    )
    run_s[:] = rs
    run_i[:] = ri

    @pl.when(blk == pl.num_programs(0) - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


@functools.partial(jax.jit, static_argnames=("k_top", "block_n", "interpret"))
def dot_topk(
    queries: jax.Array,  # [B, d]
    items: jax.Array,  # [N, d]
    k_top: int = 10,
    block_n: int = 4096,
    interpret: bool = False,
):
    """Fused Pallas top-k: returns (scores [B, k_top], indices [B, k_top])."""
    b, d = queries.shape
    n = items.shape[0]
    # pad to hardware tiles: B to 8, d to 128, K to 128 lanes internally
    b_pad = _round_up(max(b, 8), 8)
    d_pad = _round_up(max(d, 128), 128)
    k_pad = _round_up(max(k_top, 128), 128)
    # clamp block_n so scores + double-buffered item blocks + running top-k
    # fit VMEM; large blocks amortize the per-grid-step overhead
    while block_n > 256 and (
        b_pad * block_n + 2 * block_n * d_pad + 4 * b_pad * k_pad
    ) * 4 > 12 * 1024 * 1024:
        block_n //= 2
    n_pad = _round_up(max(n, block_n), block_n)

    q = jnp.zeros((b_pad, d_pad), jnp.float32).at[:b, :d].set(queries)
    it = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(items)

    grid = (n_pad // block_n,)
    out_s, out_i = pl.pallas_call(
        functools.partial(
            _topk_kernel, k_sel=k_top, block_n=block_n, n_items=n
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_pad, k_pad), jnp.float32),
            pltpu.VMEM((b_pad, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(q, it)
    return out_s[:b, :k_top], out_i[:b, :k_top]


def topk_excluding(
    queries: jax.Array,
    items: jax.Array,
    k_top: int,
    exclude: jax.Array | None = None,  # [B, E] int32 ids to exclude, pad -1
    use_pallas: bool = True,
    interpret: bool = False,
):
    """Top-k with per-query exclusion sets (the recommender-chain pattern:
    logics/recommend.go excludes already-consumed items).

    Fetches k_top + E candidates then filters, keeping exactness.
    """
    e = 0 if exclude is None else exclude.shape[1]
    fetch = min(k_top + e, items.shape[0])
    if use_pallas:
        s, i = dot_topk(queries, items, fetch, interpret=interpret)
    else:
        s, i = dot_topk_xla(queries, items, fetch)
    if exclude is None or e == 0:
        return s[:, :k_top], i[:, :k_top]
    banned = jnp.any(i[:, :, None] == exclude[:, None, :], axis=-1)  # [B, fetch]
    s = jnp.where(banned, NEG_INF, s)
    order = jnp.argsort(-s, axis=1)[:, :k_top]
    return jnp.take_along_axis(s, order, axis=1), jnp.take_along_axis(i, order, axis=1)
