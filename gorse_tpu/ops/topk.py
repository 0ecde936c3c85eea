"""Exact blocked dot-product top-k retrieval.

Covers the reference's MF serving index (logics/cf.go:36-124 — brute-force
dot top-k over item factors) and replaces common/ann HNSW: on TPU, exact
blocked top-k is cheaper than approximate graph search at gorse's scales and
returns exact results (SURVEY.md §7 design stance).

Two implementations with identical semantics:

- ``dot_topk_xla``: jnp.dot + lax.top_k (materializes [B, N] scores in HBM);
- ``dot_topk``: a Pallas kernel that streams item blocks HBM->VMEM, does the
  [B, blk] matmul on the MXU, and folds each block into a SORTED running
  top-k in VMEM scratch behind a threshold gate — the [B, N] score matrix
  never exists in HBM, and on the warm path never even materializes in
  VMEM. The default ``seeded=True`` variant runs TWO passes: pass 1 streams
  the table once computing per-block maxima (matmul + fused max epilogue,
  the HBM floor), and the k-th largest block max per query — an actual
  score, hence a LOWER bound on the true k-th best — seeds pass 2's running
  top-k, killing the cold-start churn where early blocks' transient top-k
  members each paid an extraction pass.

  r3 extraction redesign (all numbers device-looped min-of-windows, 1M
  items bf16 B=256 k=10, same measurement window): r2 kernel 3.10 ms ->
  2.71 ms. Two changes: (1) the seed moved IN-KERNEL — the host-side
  jax.lax.top_k over the [B, n_blocks] maxima lowered to a full XLA sort
  costing 1.4 ms/call; step 0 now extracts the k-th largest block max with
  k-1 tiny consume-and-re-max passes; (2) a SINGLE-PASS fast path — pass
  1's block max is known before pass 2's matmul, so the first candidate
  (max, first-column) and the count of further candidates come from fused
  reductions over the fresh scores, and only blocks where a query has >1
  candidate touch the score scratch and the consume-write loop. Attempted
  and REJECTED on measurement: (a) r2: chunked extraction (3.0 vs 2.4 ms,
  Mosaic op overhead); (b) r2: conditional per-block DMA of the item table
  (serial copies lose to auto-prefetch); (c) r3: per-32-row-group gated
  extraction, VERDICT r2 next #3's hypothesis — measured 3.45 ms vs 2.87
  single-group, because with B=256 over only ~245 blocks every block is
  needed by ~10 queries scattered across ALL row groups (group fire
  probability ~0.74), so the gates rarely save work and the extra
  conditional scopes cost ~0.6 ms; (d) r3: a read-only eligibility-mask
  fold (no consume-writes) — Mosaic materializes the captured column-iota
  chain per iteration, 50x worse. Remaining cost is the two matmul+stream
  passes themselves: the effective HBM rate measured through this chip
  varies 90-270 GB/s by time of day (shared tenancy), putting the
  two-stream floor at 1.0-2.8 ms — extraction is now ~0.1-0.3 ms on top.
  (e) r3: an int8 SHADOW table for pass 1 — conservatively widened
  upper/lower bounds from an affine-uint8 copy, exact bf16 pass 2,
  bit-identical results (verified on hardware under heavy ties). Measured
  0.77-0.91x SLOWER than the plain bf16 pass 1 in the same windows: Mosaic
  has no uint8->bf16/f32 cast, so the mandatory uint8->int32->f32->bf16
  conversion chain round-trips ~3 converted copies of every block through
  VMEM, costing more than the halved HBM stream saves (and int8 matmuls
  would need both operands int8 to earn MXU rate). Rejected; revisit only
  if Mosaic grows a native u8 cast or int8-LHS matmul.
  (f) r4: SINGLE-stream seeding (drop pass 1, seed from a sampled stripe
  or the previous batch's k-th scores — VERDICT r3 next #5). Measured the
  decisive prerequisite: the one-pass kernel from a NEG_INF start runs
  1.22x SLOWER than the two-pass (3.25 vs 2.67 ms/batch, 1M bf16 B=256,
  same window) — the cold-start extraction churn (~2.0 ms) already costs
  MORE than the entire second stream (~1.3 ms) it would save. A stripe
  seed cannot close that: the k-th best of an s-item sample sits at the
  k/s quantile (a 1% stripe -> ~the 1000th-best score at 1M items), so
  ~block_n*k/s ~ 4 candidates/block would still clear the threshold and
  fire the slow extraction path on nearly every block, while the two-pass
  seed (k-th largest of the ~245 block maxima, each a local champion)
  lands within a few ranks of the true k-th. Matching it needs s ~ N —
  the full table, i.e. pass 1. Reusing the previous batch's k-th scores
  is unsound outright: a threshold for query q is only a valid bound if
  it is an actual score OF q, and serving batches carry different
  queries. Rejected; the two-pass form is the design point. Batches >256
  chunk internally instead of degrading through the scoped-VMEM block
  cap (B=1024: 374k q/s chunked vs 51k direct in the same window).

  The same two-pass kernel serves SCALAR-QUANTIZED tables (PreparedSQ):
  uint8 code blocks stream at 1/4 the f32 bytes and the per-row affine
  folds in as a matmul epilogue (see _block_scores). Measured 104k q/s at
  1M items B=256 (2.47 ms/batch, device-looped) vs 21.7k q/s for the XLA
  formulation it replaces on the serving path (whose lax.top_k over the
  full [B, N] score matrix lowered to a sort) — 4.8x, hardware parity
  1.5e-5 vs the XLA scores.

The item table is stored TRANSPOSED ``[d, N]`` with the item axis on lanes:
the factor dim d only pads to the sublane tile (8/16) instead of to 128
lanes, so a d=64 catalog streams exactly its own bytes from HBM (the
row-major layout would double them, and at d=16 waste 8x). Build the layout
once with :func:`prepare_items` and reuse it across serving calls; passing a
raw ``[N, d]`` array transposes on the fly (fine for one-shot use).
``mm_dtype=bf16`` halves HBM traffic again and runs the matmul at full MXU
rate — the reference itself serves BF16 embeddings (common/bfloats), so
bf16 scoring is parity-faithful; f32 is the default for exactness.

The grid iterates sequentially over item blocks on TPU, which is what makes
the VMEM scratch accumulator correct.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30



def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class PreparedItems(NamedTuple):
    """Item table laid out for :func:`dot_topk`: transposed to [d_pad, N_pad]
    (item axis on lanes) in the matmul dtype. Build once, serve many."""

    table: jax.Array  # [d_pad, n_pad]
    n_items: int
    dim: int


def prepare_items(items: jax.Array, mm_dtype=jnp.float32) -> PreparedItems:
    """[N, d] -> transposed padded [d_pad, N_pad] table for dot_topk."""
    n, d = items.shape
    sub = 8 if mm_dtype == jnp.float32 else 16
    d_pad = _round_up(max(d, sub), sub)
    n_pad = _round_up(max(n, 128), 128)
    table = jnp.zeros((d_pad, n_pad), mm_dtype).at[:d, :n].set(
        items.T.astype(mm_dtype)
    )
    return PreparedItems(table, n, d)


class PreparedSQ(NamedTuple):
    """Scalar-quantized table laid out for the Pallas top-k: transposed uint8
    codes [d_pad, N_pad] (4x less HBM stream than f32 rows) plus a [8, N_pad]
    f32 affine sheet (rows 0/1/2 = scale / minv / norms2). Build once with
    :func:`prepare_sq_items`, serve many."""

    table: jax.Array   # [d_pad, n_pad] uint8
    affine: jax.Array  # [8, n_pad] f32
    n_items: int
    dim: int
    has_norms2: bool = False  # affine row 2 populated (euclidean-capable)


def prepare_sq_items(
    codes: jax.Array,  # [N, d] uint8 (per-row affine codes, _quantize_sq)
    scale: jax.Array,  # [N] f32
    minv: jax.Array,   # [N] f32
    norms2: jax.Array | None = None,  # [N] ||dequantized row||^2 (euclidean)
) -> PreparedSQ:
    n, d = codes.shape
    d_pad = _round_up(max(d, 32), 32)  # uint8 sublane tile
    n_pad = _round_up(max(n, 128), 128)
    table = jnp.zeros((d_pad, n_pad), jnp.uint8).at[:d, :n].set(
        codes.T.astype(jnp.uint8)
    )
    aff = jnp.zeros((8, n_pad), jnp.float32)
    aff = aff.at[0, :n].set(scale.astype(jnp.float32))
    aff = aff.at[1, :n].set(minv.astype(jnp.float32))
    if norms2 is not None:
        aff = aff.at[2, :n].set(norms2.astype(jnp.float32))
    return PreparedSQ(table, aff, n, d, norms2 is not None)


def dot_topk_xla(queries: jax.Array, items: jax.Array, k_top: int):
    """Reference implementation: full score matrix + lax.top_k."""
    scores = jnp.dot(queries, items.T, preferred_element_type=jnp.float32)
    top_scores, top_idx = jax.lax.top_k(scores, k_top)
    return top_scores, top_idx.astype(jnp.int32)


def sq_topk(
    queries: jax.Array,
    codes: jax.Array | PreparedSQ,
    scale: jax.Array | None = None,
    minv: jax.Array | None = None,
    k_top: int = 10,
    norms2: jax.Array | None = None,
    metric: str = "dot",
    interpret: bool = False,
):
    """Top-k over scalar-quantized vectors, dequantized *inside* the matmul.

    Pass a :class:`PreparedSQ` (built once with :func:`prepare_sq_items`) on
    serving paths: the streaming Pallas kernel then scores uint8 blocks with
    the affine folded in as a matmul epilogue — the [B, N] score matrix
    never exists, the table streams at 1/4 the f32 bytes, and the XLA
    ``lax.top_k`` (which lowers to a full sort and dominated the quantized
    serving path: 21.7k q/s at 1M items vs ~150k for the Pallas bf16 path)
    is bypassed entirely. Raw (codes, scale, minv) arrays keep the one-shot
    XLA formulation below.

    Rows are stored as uint8 codes with per-row affine params
    (``v = minv + scale * codes``), so exact dot products follow from one
    int8-input matmul plus rank-1 corrections:

        q . v = scale * (q . codes) + minv * sum(q)

    The codes upcast to bf16 on the MXU — 4x less HBM traffic than f32
    rows. ``metric``: "dot" | "cosine" (rows pre-normalized at ingest) |
    "euclidean" (needs ``norms2 = ||v||^2``; returns negative distances so
    larger is always better).
    """
    if isinstance(codes, PreparedSQ):
        if metric == "euclidean" and not codes.has_norms2:
            # without norms2 the affine sheet's row 2 is all zeros and the
            # kernel would silently rank by 2*dots - q2 (ADVICE r3 #2) —
            # mirror the raw-array path's ValueError instead
            raise ValueError(
                "sq_topk(metric='euclidean') on a PreparedSQ built without "
                "norms2 — pass norms2 to prepare_sq_items"
            )
        return _chunked_prepared(
            queries, codes.table, codes.n_items, codes.dim, k_top,
            block_n=4096, interpret=interpret, seeded=True,
            affine=codes.affine, metric=metric,
        )
    if metric == "euclidean" and norms2 is None:
        raise ValueError("sq_topk(metric='euclidean') requires norms2 (||v||^2 per row)")
    return _sq_topk_xla(queries, codes, scale, minv, k_top, norms2, metric)


@functools.partial(jax.jit, static_argnames=("k_top", "metric"))
def _sq_topk_xla(queries, codes, scale, minv, k_top, norms2=None, metric="dot"):
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


@functools.partial(jax.jit, static_argnames=("k_top", "metric"))
def pq_topk(
    queries: jax.Array,   # [B, d]
    codes: jax.Array,     # [N, M] uint8 subquantizer codes
    codebooks: jax.Array, # [M, C, ds] f32 centroids, d = M * ds
    norms2: jax.Array,    # [N] squared norms of the dequantized rows
    k_top: int,
    metric: str = "dot",
):
    """Top-k over product-quantized vectors.

    Rows live in HBM as ``M`` uint8 codes (32/bits x compression at rest,
    matching the reference's PQ ratios, storage/vectors/qdrant.go:179-195).
    The query path dequantizes each subspace with one vectorized codebook
    gather and scores on the MXU — asymmetric-distance via dequant+matmul
    rather than a per-query LUT scan, because on TPU the [B, N] matmul is
    MXU-bound while an LUT gather over N codes is a VPU/gather bottleneck.

    Approximate by construction (quantization error), like the reference's
    delegated PQ backends. ``metric`` as in :func:`sq_topk`.
    """
    # [M, C, ds] gathered at codes[:, m] -> [N, M, ds] -> [N, d]
    vhat = jax.vmap(lambda cb, c: cb[c], in_axes=(0, 1), out_axes=1)(
        codebooks, codes.astype(jnp.int32)
    )
    n = codes.shape[0]
    vhat = vhat.reshape(n, -1).astype(jnp.bfloat16)
    q = queries.astype(jnp.float32)
    dots = jnp.dot(q, vhat.T, preferred_element_type=jnp.float32)
    if metric == "euclidean":
        q2 = jnp.sum(q * q, axis=1, keepdims=True)
        scores = -(q2 - 2.0 * dots + norms2[None, :])
    else:
        scores = dots
    top_scores, top_idx = jax.lax.top_k(scores, k_top)
    return top_scores, top_idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k_top", "bits", "dim", "metric"))
def rq_topk(
    queries: jax.Array,  # [B, d]
    packed: jax.Array,   # [N, ceil(d*bits/8)] packed b-bit codes
    scale: jax.Array,    # [N] per-row dequant scale
    minv: jax.Array,     # [N] per-row dequant offset
    rot: jax.Array,      # [d, d] orthogonal rotation
    norms2: jax.Array,   # [N] squared norms of the dequantized rows
    k_top: int,
    bits: int,
    dim: int,
    metric: str = "dot",
):
    """Top-k over rotational (RaBitQ-style) quantized vectors.

    Encoding rotates each row by a shared orthogonal matrix, then scalar-
    quantizes the rotated coordinates to ``bits`` in {1, 2, 4} with per-row
    affine params — the rotation spreads coordinate variance so very few
    bits suffice (the reference's ``rq`` / TurboQuant / RaBitQ family,
    storage/vectors/database.go:41). Because the rotation is orthogonal,
    ``q . v = (Rq) . (Rv)``, so scoring is the sq affine-correction trick in
    the rotated basis: unpack sub-byte codes on the VPU, one bf16 matmul on
    the MXU, plus rank-1 corrections. 8x-32x less HBM than f32 rows.
    """
    per_byte = 8 // bits
    mask = (1 << bits) - 1
    shifts = (jnp.arange(per_byte, dtype=jnp.uint8) * bits)[None, None, :]
    vals = (packed[:, :, None] >> shifts) & mask          # [N, P, per_byte]
    codes = vals.reshape(packed.shape[0], -1)[:, :dim]    # [N, d]
    rq = jnp.dot(queries.astype(jnp.float32), rot.T,
                 preferred_element_type=jnp.float32)      # [B, d]
    partial = jnp.dot(rq, codes.astype(jnp.bfloat16).T,
                      preferred_element_type=jnp.float32)
    dots = partial * scale[None, :] + jnp.sum(rq, axis=1, keepdims=True) * minv[None, :]
    if metric == "euclidean":
        q2 = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        scores = -(q2 - 2.0 * dots + norms2[None, :])
    else:
        scores = dots
    top_scores, top_idx = jax.lax.top_k(scores, k_top)
    return top_scores, top_idx.astype(jnp.int32)


def _block_scores(q_ref, item_ref, affine_ref, base, *, block_n, has_affine, metric):
    """Corrected scores for one item block, shared by all three kernels.

    Plain tables: one MXU dot in the table dtype. Scalar-quantized tables
    (``has_affine``): the block streams as uint8 codes (4x less HBM than
    f32, 2x less than bf16), upcast to bf16 on the fly, and the per-column
    affine ``v = minv + scale * codes`` folds in AFTER the matmul as

        q . v = (q . codes) * scale_col + sum(q) * minv_col

    with ``affine_ref`` rows 0/1/2 = scale/minv/norms2 (prepare_sq_items).
    ``metric`` "euclidean" returns negative squared distances (larger =
    better, matching sq_topk's XLA convention); "dot" covers cosine too
    (rows pre-normalized at ingest)."""
    if not has_affine:
        return jax.lax.dot_general(
            q_ref[:], item_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    q = q_ref[:]  # f32 on the sq path (exact qsum/q2)
    # Mosaic has no direct uint8 -> bf16 cast; chain via int32/f32
    codes_bf16 = (
        item_ref[:].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    )
    raw = jax.lax.dot_general(
        q.astype(jnp.bfloat16), codes_bf16,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    aff = affine_ref[:]  # [8, block_n]: rows scale / minv / norms2
    qsum = jnp.sum(q, axis=1, keepdims=True)  # [B, 1]
    dots = raw * aff[0:1, :] + qsum * aff[1:2, :]
    if metric == "euclidean":
        q2 = jnp.sum(q * q, axis=1, keepdims=True)
        return 2.0 * dots - aff[2:3, :] - q2
    return dots


def _block_max_kernel(
    q_ref, item_ref, *rest, block_n, n_items, has_affine=False, metric="dot"
):
    """Pass 1 of the seeded top-k: per-query maxima of each item block.

    Pure matmul + max — the scores have a single consumer, so Mosaic folds
    the reduce into the matmul epilogue and the [B, block_n] block never
    round-trips VMEM (the measured ~0.2 ms/batch HBM-stream floor at 1M
    items). Only the tail block pays a masked max for the zero padding.

    The per-block maxima land in a [B, n_blocks_pad] VMEM scratch (written
    column-by-column with a lane mask, copied out on the last step) because
    Mosaic forbids (B, 1) output blocks — the lane dim of a blocked spec
    must be 128-divisible or span the whole array."""
    affine_ref = rest[0] if has_affine else None
    max_out_ref, acc = rest[-2], rest[-1]
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        acc[:] = jnp.full_like(acc, NEG_INF)

    scores = _block_scores(
        q_ref, item_ref, affine_ref, blk * block_n,
        block_n=block_n, has_affine=has_affine, metric=metric,
    )
    n_full = n_items // block_n  # blocks strictly before the ragged tail
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + blk * block_n
    m = jnp.max(
        jnp.where(
            jnp.logical_or(blk < n_full, col_ids < n_items), scores, NEG_INF
        ),
        axis=1,
        keepdims=True,
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    acc[:] = jnp.where(lane == blk, m, acc[:])

    @pl.when(blk == pl.num_programs(0) - 1)
    def _():
        max_out_ref[:] = acc[:]


def _fold_scores_into_topk_from_scratch(sc, run_s, run_i, col_ids, v0, *, k_sel):
    """The r2 consume-write extraction loop, entered with the scores ALREADY
    in the ``sc`` scratch and the per-query running max ``v0`` precomputed —
    the seeded kernel's slow path after its single-pass fast path consumed
    each query's first candidate (see _topk_seeded_kernel)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, run_s.shape, 1)  # [B, k_pad]

    def cond(carry):
        it, v = carry
        kth = run_s[:, k_sel - 1 : k_sel]
        return jnp.logical_and(it < k_sel, jnp.any(v > kth))

    def body(carry):
        it, v = carry
        s = sc[:]
        rs = run_s[:]
        ri = run_i[:]
        kth = rs[:, k_sel - 1 : k_sel]
        active = v > kth  # queries whose top-k changes this pass
        at_max = s == v
        idx = jnp.min(
            jnp.where(at_max, col_ids, jnp.int32(2**31 - 1)), axis=1, keepdims=True
        )
        s2 = jnp.where(jnp.logical_and(at_max, col_ids == idx), NEG_INF, s)
        sc[:] = s2
        v_next = jnp.max(s2, axis=1, keepdims=True)
        nge = jnp.sum((rs >= v).astype(jnp.int32), axis=1, keepdims=True)
        prev_s = jnp.concatenate([rs[:, :1], rs[:, :-1]], axis=1)
        prev_i = jnp.concatenate([ri[:, :1], ri[:, :-1]], axis=1)
        new_s = jnp.where(lane < nge, rs, jnp.where(lane == nge, v, prev_s))
        new_i = jnp.where(lane < nge, ri, jnp.where(lane == nge, idx, prev_i))
        run_s[:] = jnp.where(active, new_s, rs)
        run_i[:] = jnp.where(active, new_i, ri)
        return it + 1, v_next

    jax.lax.while_loop(cond, body, (jnp.int32(0), v0))


def _topk_seeded_kernel(
    q_ref, item_ref, bmax_ref, *rest,
    k_sel, block_n, n_items, n_blocks, has_affine=False, metric="dot",
):
    """Pass 2 of the seeded top-k: fold item blocks into a running top-k that
    starts at the seed threshold (the k-th largest block max, an actual score
    and hence a LOWER bound on the final k-th best — nudged one ulp down so
    ties still insert). The gate reads pass 1's block maxima instead of
    recomputing the matmul, so a firing block pays ONE matmul; a quiet block
    pays none. Seeding kills the cold-start churn where early blocks'
    transient top-k members (~k*ln(n_blocks) per query) each paid an
    extraction pass. The full [B, n_blocks_pad] maxima table rides along in
    VMEM (it is small) and each step extracts its column with a lane-masked
    max-reduce — blocked (B, 1) input specs and dynamic lane slices are both
    unlowerable on TPU (Mosaic requires 128-divisible lane indexing).

    At step 0 the kernel derives its own seed from the maxima table (see
    the in-kernel extraction below); firing blocks use the single-pass fast
    path — insert (m, first-column-at-m) via fused reductions — and only
    fall to the consume-write loop when some query has more than one
    candidate in the block (the module docstring records the measured
    rejections of per-row-group gating and a read-only fold).

    Attempted and REJECTED: keeping the item table in HBM (memory_space=ANY)
    with an explicit single-buffered DMA only on firing blocks, to spare
    quiet blocks the re-stream. Measured WORSE on v5e at 1M items/bf16
    (B=256: 2.13 vs 1.51 ms; B=32: 1.07 vs 0.69): the batch-global gate
    fires often enough that the serial, non-overlapped per-block DMA wait
    costs more than the full double-buffered prefetch stream it replaced.
    Auto-streamed blocks ride the prefetch pipeline for free; a future
    attempt needs a prefetch predicate (conservative: next block's max vs
    the CURRENT k-th best, a superset of true firing) to overlap the
    conditional copies."""
    affine_ref = rest[0] if has_affine else None
    out_s_ref, out_i_ref, run_s, run_i, sc = rest[1 if has_affine else 0:]
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        # Seed = the k-th largest block max per query, nudged down so ties
        # still insert. Computed HERE by static-unrolled extraction over the
        # [B, nb_pad] maxima table (tiny VMEM passes) — the previous host-side
        # jax.lax.top_k over the maxima lowered to a full XLA sort and cost
        # 1.46 ms/call on v5e, more than the whole extraction phase.
        run_i[:] = jnp.zeros_like(run_i)
        if k_sel > n_blocks:
            run_s[:] = jnp.full_like(run_s, NEG_INF)
        else:
            bm0 = bmax_ref[:]  # padded lanes already NEG_INF from pass 1
            cols = jax.lax.broadcasted_iota(jnp.int32, bm0.shape, 1)
            big0 = jnp.int32(2**31 - 1)
            v = jnp.max(bm0, axis=1, keepdims=True)
            for _t in range(k_sel - 1):  # consume one occurrence, re-max
                at = bm0 == v
                first = jnp.min(jnp.where(at, cols, big0), axis=1, keepdims=True)
                bm0 = jnp.where(jnp.logical_and(at, cols == first), NEG_INF, bm0)
                v = jnp.max(bm0, axis=1, keepdims=True)
            # one-ulp-down equivalent, conservative: a lower bound stays
            # correct, only marginally less tight
            seed = v - (jnp.abs(v) * 1.2e-7 + 1e-30)
            run_s[:] = jnp.broadcast_to(seed, run_s.shape)

    base = blk * block_n
    bm = bmax_ref[:]  # [B, nb_pad]
    bl = jax.lax.broadcasted_iota(jnp.int32, bm.shape, 1)
    m = jnp.max(jnp.where(bl == blk, bm, NEG_INF), axis=1, keepdims=True)
    kth0 = run_s[:, k_sel - 1 : k_sel]
    fire = m > kth0  # [B, 1] per-query: this block holds a top-k entry

    @pl.when(jnp.any(fire))
    def _():
        scores = _block_scores(
            q_ref, item_ref, affine_ref, base,
            block_n=block_n, has_affine=has_affine, metric=metric,
        )
        b = scores.shape[0]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, block_n), 1) + base
        masked = jnp.where(col_ids < n_items, scores, NEG_INF)  # tail padding
        big = jnp.int32(2**31 - 1)

        # SINGLE-PASS fast path: pass 1's block max ``m`` is known BEFORE
        # the matmul, so the first candidate per query — (m, first column
        # at m) — and the count of remaining candidates come from one fused
        # reduction pass over the fresh scores; the overwhelmingly common
        # case (a firing block contributes exactly one top-k entry per
        # affected query) never touches the score scratch or the extraction
        # loop at all.
        at_max = masked == m
        idx0 = jnp.min(jnp.where(at_max, col_ids, big), axis=1, keepdims=True)
        cnt = jnp.sum((masked > kth0).astype(jnp.int32), axis=1, keepdims=True)
        active = jnp.logical_and(fire, idx0 < big)
        lane = jax.lax.broadcasted_iota(jnp.int32, run_s.shape, 1)
        rs = run_s[:]
        ri = run_i[:]
        nge = jnp.sum((rs >= m).astype(jnp.int32), axis=1, keepdims=True)
        prev_s = jnp.concatenate([rs[:, :1], rs[:, :-1]], axis=1)
        prev_i = jnp.concatenate([ri[:, :1], ri[:, :-1]], axis=1)
        new_s = jnp.where(lane < nge, rs, jnp.where(lane == nge, m, prev_s))
        new_i = jnp.where(lane < nge, ri, jnp.where(lane == nge, idx0, prev_i))
        run_s[:] = jnp.where(active, new_s, rs)
        run_i[:] = jnp.where(active, new_i, ri)

        # slow path only when some query has MORE candidates in this block
        # (or the paranoia case: m missing from the recomputed scores):
        # consume the inserted element and run the r2 extraction loop
        multi = jnp.logical_or(
            jnp.any(cnt > 1), jnp.any(jnp.logical_and(fire, idx0 >= big))
        )

        @pl.when(multi)
        def _():
            consumed = jnp.logical_and(
                jnp.logical_and(at_max, col_ids == idx0), active
            )
            sc[:] = jnp.where(consumed, NEG_INF, masked)
            v0 = jnp.max(sc[:], axis=1, keepdims=True)
            _fold_scores_into_topk_from_scratch(
                sc, run_s, run_i, col_ids, v0, k_sel=k_sel
            )

    @pl.when(blk == pl.num_programs(0) - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


def _topk_kernel(
    q_ref, item_ref, *rest,
    k_sel, block_n, n_items, has_affine=False, metric="dot",
):
    """Single-stream top-k: one grid step folds item block ``pl.program_id``
    into the SORTED running top-k. No maxima pre-pass — the block max is
    computed inline as a fused epilogue of the (always-run) matmul, so the
    table streams HBM exactly once; the cost vs the seeded kernel is the
    cold-start churn (the running k-th bests start at NEG_INF, so early
    blocks insert ~k*ln(n_blocks) transient entries per query).

    Extraction uses the same single-pass fast path as the seeded kernel:
    the first candidate per query — (block max, its first column) — and the
    count of further candidates come from fused reductions over the fresh
    scores; only blocks where some query has MORE than one candidate touch
    the score scratch and the consume-write loop."""
    affine_ref = rest[0] if has_affine else None
    out_s_ref, out_i_ref, run_s, run_i, sc = rest[1 if has_affine else 0:]
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        run_s[:] = jnp.full_like(run_s, NEG_INF)
        run_i[:] = jnp.zeros_like(run_i)

    base = blk * block_n
    scores = _block_scores(
        q_ref, item_ref, affine_ref, base,
        block_n=block_n, has_affine=has_affine, metric=metric,
    )
    b = scores.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, block_n), 1) + base
    masked = jnp.where(col_ids < n_items, scores, NEG_INF)  # tail padding
    m = jnp.max(masked, axis=1, keepdims=True)  # fused matmul epilogue
    kth0 = run_s[:, k_sel - 1 : k_sel]
    fire = m > kth0

    @pl.when(jnp.any(fire))
    def _():
        big = jnp.int32(2**31 - 1)
        at_max = masked == m
        idx0 = jnp.min(jnp.where(at_max, col_ids, big), axis=1, keepdims=True)
        cnt = jnp.sum((masked > kth0).astype(jnp.int32), axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, run_s.shape, 1)
        rs = run_s[:]
        ri = run_i[:]
        nge = jnp.sum((rs >= m).astype(jnp.int32), axis=1, keepdims=True)
        prev_s = jnp.concatenate([rs[:, :1], rs[:, :-1]], axis=1)
        prev_i = jnp.concatenate([ri[:, :1], ri[:, :-1]], axis=1)
        new_s = jnp.where(lane < nge, rs, jnp.where(lane == nge, m, prev_s))
        new_i = jnp.where(lane < nge, ri, jnp.where(lane == nge, idx0, prev_i))
        run_s[:] = jnp.where(fire, new_s, rs)
        run_i[:] = jnp.where(fire, new_i, ri)

        @pl.when(jnp.any(cnt > 1))
        def _():
            consumed = jnp.logical_and(
                jnp.logical_and(at_max, col_ids == idx0), fire
            )
            sc[:] = jnp.where(consumed, NEG_INF, masked)
            v0 = jnp.max(sc[:], axis=1, keepdims=True)
            _fold_scores_into_topk_from_scratch(
                sc, run_s, run_i, col_ids, v0, k_sel=k_sel
            )

    @pl.when(blk == pl.num_programs(0) - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


@functools.partial(
    jax.jit,
    static_argnames=("k_top", "block_n", "interpret", "n_items", "dim", "seeded", "metric"),
)
def _dot_topk_prepared(
    queries: jax.Array,  # [B, d]
    table: jax.Array,  # [d_pad, n_pad] transposed items (prepare_items)
    n_items: int,
    dim: int,
    k_top: int,
    block_n: int,
    interpret: bool,
    seeded: bool = True,
    affine: jax.Array | None = None,  # [8, n_pad] scale/minv/norms2 (sq path)
    metric: str = "dot",
):
    b = queries.shape[0]
    d_pad, n_pad = table.shape
    b_pad = _round_up(max(b, 8), 8)
    k_pad = _round_up(max(k_top, 128), 128)
    esize = jnp.dtype(table.dtype).itemsize
    has_affine = affine is not None

    def vmem_cost(blk: int, with_seed: bool) -> int:
        # live scores + score scratch + running top-k + q, plus the
        # double-buffered item blocks; the seeded path additionally holds
        # the [b_pad, nb_pad] block-maxima table (acc scratch + output in
        # pass 1, input block in pass 2) — and nb_pad GROWS as block_n
        # shrinks, so this term must be inside the search, not bolted on
        nb = _round_up(-(-n_pad // blk), 128) if with_seed else 0
        return (
            (2 * b_pad * blk + 4 * b_pad * k_pad + b_pad * d_pad) * 4
            + 2 * blk * d_pad * esize
            + 3 * b_pad * nb * 4
            + (2 * 8 * blk * 4 if has_affine else 0)  # affine sheet blocks
        )

    # pick the largest block_n that fits the budget (large blocks amortize
    # per-grid-step overhead); if nothing fits with the maxima buffers,
    # drop to the single-pass kernel rather than overflow VMEM
    budget = 12 * 1024 * 1024
    # Empirical cap beyond the analytic budget: the compiler's scoped-vmem
    # stack for the extraction temporaries grows with b_pad * block_n, and
    # B=1024 x block 1024 measured a 16.3M scoped allocation against the
    # 16M limit on v5e. Keep b_pad * block_n at or below the proven
    # 256 x 4096 point once the batch exceeds 256.
    if b_pad > 256:
        block_n = min(block_n, max(512, (256 * 4096) // b_pad // 2))
    candidates_bn = [bn for bn in (block_n, 2048, 1024, 512, 256) if bn <= block_n]
    fit = [bn for bn in candidates_bn if vmem_cost(bn, seeded) <= budget]
    if fit:
        block_n = fit[0]
    else:
        if seeded:  # maxima buffers don't fit: drop to the single-pass kernel
            seeded = False
            fit = [bn for bn in candidates_bn if vmem_cost(bn, False) <= budget]
        if fit:
            block_n = fit[0]
        else:
            # last resort: halve below the caller's block_n (never above it)
            # until the budget holds; refuse rather than overflow VMEM
            bn = min(256, block_n)
            while bn >= 128 and vmem_cost(bn, False) > budget:
                bn //= 2
            if bn < 128:
                raise ValueError(
                    f"dot_topk: no block_n <= {block_n} fits the "
                    f"{budget // 2**20}MB VMEM budget for batch={b}, "
                    f"k_top={k_top} — reduce the batch or k"
                )
            block_n = bn
    if n_pad % block_n:
        pad_n = _round_up(n_pad, block_n) - n_pad
        table = jnp.pad(table, ((0, 0), (0, pad_n)))
        if has_affine:
            affine = jnp.pad(affine, ((0, 0), (0, pad_n)))
        n_pad = table.shape[1]

    # sq path keeps the queries f32 (exact qsum/q2 corrections in-kernel);
    # plain path casts to the table dtype as before
    q_dtype = jnp.float32 if has_affine else table.dtype
    q = jnp.zeros((b_pad, d_pad), q_dtype).at[:b, :dim].set(
        queries[:, :dim].astype(q_dtype)
    )

    grid = (n_pad // block_n,)
    n_blocks = grid[0]
    aff_args = (affine,) if has_affine else ()
    aff_specs = (
        [pl.BlockSpec((8, block_n), lambda i: (0, i), memory_space=pltpu.VMEM)]
        if has_affine
        else []
    )
    if not seeded:
        out_s, out_i = pl.pallas_call(
            functools.partial(
                _topk_kernel, k_sel=k_top, block_n=block_n, n_items=n_items,
                has_affine=has_affine, metric=metric,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d_pad, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            ] + aff_specs,
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
                pltpu.VMEM((b_pad, block_n), jnp.float32),
            ],
            interpret=interpret,
        )(q, table, *aff_args)
        return out_s[:b, :k_top], out_i[:b, :k_top]

    # ---- pass 1: per-block maxima (pure matmul+max stream) ----
    nb_pad = _round_up(n_blocks, 128)
    bmax = pl.pallas_call(
        functools.partial(
            _block_max_kernel, block_n=block_n, n_items=n_items,
            has_affine=has_affine, metric=metric,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + aff_specs,
        out_specs=pl.BlockSpec((b_pad, nb_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, nb_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, nb_pad), jnp.float32)],
        interpret=interpret,
    )(q, table, *aff_args)
    # ---- pass 2: gated fold with maxima reuse; the seed (k-th largest
    # block max, a lower bound on the true k-th best) is derived from the
    # maxima table inside the kernel at step 0 ----
    out_s, out_i = pl.pallas_call(
        functools.partial(
            _topk_seeded_kernel, k_sel=k_top, block_n=block_n, n_items=n_items,
            n_blocks=n_blocks, has_affine=has_affine, metric=metric,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, nb_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + aff_specs,
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
            pltpu.VMEM((b_pad, block_n), jnp.float32),
        ],
        interpret=interpret,
    )(q, table, bmax, *aff_args)
    return out_s[:b, :k_top], out_i[:b, :k_top]


# The kernel's batch design point. Larger batches shrink the item block
# through the scoped-VMEM cap (B=1024 measured 54k q/s vs 161k at B=256 in
# the same window — VERDICT r3 weak #4), so the public entry points chunk
# the batch here instead of silently degrading; every chunk reuses one
# compiled [256, d] executable.
_CHUNK_B = 256


def _chunked_prepared(queries: jax.Array, *args, **kwargs):
    """Run _dot_topk_prepared in batch chunks of _CHUNK_B, padding the tail
    chunk so all chunks share one compilation."""
    b = queries.shape[0]
    if b <= _CHUNK_B:
        return _dot_topk_prepared(queries, *args, **kwargs)
    ss, ii = [], []
    for lo in range(0, b, _CHUNK_B):
        qc = queries[lo : lo + _CHUNK_B]
        if qc.shape[0] < _CHUNK_B:
            qc = jnp.pad(qc, ((0, _CHUNK_B - qc.shape[0]), (0, 0)))
        s, i = _dot_topk_prepared(qc, *args, **kwargs)
        ss.append(s)
        ii.append(i)
    return jnp.concatenate(ss)[:b], jnp.concatenate(ii)[:b]


def dot_topk(
    queries: jax.Array,  # [B, d]
    items: jax.Array | PreparedItems,  # [N, d] or prepare_items(...) output
    k_top: int = 10,
    block_n: int = 4096,
    interpret: bool = False,
    mm_dtype=jnp.float32,
    seeded: bool = True,
):
    """Fused Pallas top-k: returns (scores [B, k_top], indices [B, k_top]).

    Pass a :class:`PreparedItems` (built once with :func:`prepare_items`) on
    serving paths so the transpose/cast isn't paid per call; a raw [N, d]
    array is prepared on the fly. ``seeded=True`` (default) runs the
    two-pass bound-seeded kernel (maxima pre-pass + gated fold);
    ``seeded=False`` keeps the single-pass r1 kernel for comparison.
    Batches above 256 rows are chunked internally (see _CHUNK_B).
    """
    if not isinstance(items, PreparedItems):
        items = prepare_items(items, mm_dtype)
    return _chunked_prepared(
        queries, items.table, items.n_items, items.dim, k_top, block_n, interpret,
        seeded=seeded,
    )


def dot_topk_approx(
    queries: jax.Array,
    items: jax.Array | PreparedItems,
    k_top: int = 10,
    recall_target: float = 0.99,
):
    """APPROXIMATE top-k via the TPU's hardware PartialReduce op
    (``jax.lax.approx_max_k``): the matmul fuses into the reduction, so one
    query batch costs ONE table stream with no extraction pass at all.

    This is the approximate serving tier — the analog of the reference's
    HNSW (common/ann/hnsw.go), which is also approximate by design. The
    exact kernels (:func:`dot_topk`) stay the default; this tier exists for
    catalogs where the exact two-pass stream is the bottleneck. Measured
    (1M items, d=64, bf16, B=256, k=10, device-looped, healthy window):
    **0.46 ms/batch = 552k q/s at measured recall@10 = 0.995**
    (recall_target=0.99) vs 1.58 ms/165k q/s for the exact seeded kernel —
    3.3x, at a recall point above typical HNSW serving configurations.
    Counter-intuitively recall_target=0.99 measured FASTER than 0.9/0.95
    (0.46 vs 0.80-0.83 ms) — the lowering picks a different reduction
    shape; both were measured in the same window.

    Padding columns (``prepare_items`` pads the lane axis to 128) are
    masked to NEG_INF with a fused iota compare — measured free (the
    elementwise mask fuses between matmul and reduce; the [B, N] score
    matrix still never materializes).
    """
    if not isinstance(items, PreparedItems):
        items = prepare_items(items, jnp.bfloat16)
    table, n_items, dim = items.table, items.n_items, items.dim
    b = queries.shape[0]
    q = jnp.zeros((b, table.shape[0]), table.dtype).at[:, :dim].set(
        queries[:, :dim].astype(table.dtype)
    )
    s = jnp.dot(q, table, preferred_element_type=jnp.float32)
    if table.shape[1] != n_items:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_items, s, NEG_INF)
    return jax.lax.approx_max_k(
        s, min(k_top, n_items), recall_target=recall_target
    )


def sq_topk_approx(
    queries: jax.Array,
    prep: PreparedSQ,
    k_top: int = 10,
    recall_target: float = 0.99,
    metric: str = "dot",
):
    """Approximate top-k over a scalar-quantized table via the PartialReduce
    op — the quantized sibling of :func:`dot_topk_approx`. Measured (1M
    items, d=64, B=256, k=10, device-looped): **0.45 ms/batch = 564k q/s at
    recall@10 = 0.994** vs 1.49 ms/172k q/s for the exact sq Pallas kernel
    — 3.3x. (The u8->bf16 convert materializes a bf16 copy per call under
    XLA, so the uint8 stream saving is lost — the win here is the fused
    reduction replacing the gated extraction, not the stream.)"""
    if metric == "euclidean" and not prep.has_norms2:
        raise ValueError(
            "sq_topk_approx(metric='euclidean') on a PreparedSQ built "
            "without norms2 — pass norms2 to prepare_sq_items"
        )
    table, aff, n_items, dim = prep.table, prep.affine, prep.n_items, prep.dim
    qp = jnp.zeros((queries.shape[0], table.shape[0]), jnp.float32).at[
        :, :dim
    ].set(queries[:, :dim].astype(jnp.float32))
    raw = jnp.dot(
        qp.astype(jnp.bfloat16), table.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    qsum = jnp.sum(qp, axis=1, keepdims=True)
    s = raw * aff[0:1, :] + qsum * aff[1:2, :]
    if metric == "euclidean":
        q2 = jnp.sum(qp * qp, axis=1, keepdims=True)
        s = 2.0 * s - aff[2:3, :] - q2
    if table.shape[1] != n_items:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_items, s, NEG_INF)
    return jax.lax.approx_max_k(
        s, min(k_top, n_items), recall_target=recall_target
    )


def topk_excluding(
    queries: jax.Array,
    items: jax.Array,
    k_top: int,
    exclude: jax.Array | None = None,  # [B, E] int32 ids to exclude, pad -1
    use_pallas: bool = True,
    interpret: bool = False,
    approx_recall: float | None = None,
):
    """Top-k with per-query exclusion sets (the recommender-chain pattern:
    logics/recommend.go excludes already-consumed items).

    Fetches k_top + E candidates then filters — exact unless
    ``approx_recall`` is set (< 1.0), which routes the fetch through the
    approximate PartialReduce tier (:func:`dot_topk_approx`), the HNSW
    analog."""
    n = items.n_items if isinstance(items, PreparedItems) else items.shape[0]
    e = 0 if exclude is None else exclude.shape[1]
    fetch = min(k_top + e, n)
    if approx_recall is not None and approx_recall < 1.0:
        s, i = dot_topk_approx(queries, items, fetch, recall_target=approx_recall)
    elif use_pallas:
        s, i = dot_topk(queries, items, fetch, interpret=interpret)
    else:
        if isinstance(items, PreparedItems):
            items = items.table[: items.dim, : items.n_items].T.astype(jnp.float32)
        s, i = dot_topk_xla(queries, items, fetch)
    if exclude is None or e == 0:
        return s[:, :k_top], i[:, :k_top]
    banned = jnp.any(i[:, :, None] == exclude[:, None, :], axis=-1)  # [B, fetch]
    s = jnp.where(banned, NEG_INF, s)
    order = jnp.argsort(-s, axis=1)[:, :k_top]
    return jnp.take_along_axis(s, order, axis=1), jnp.take_along_axis(i, order, axis=1)
