"""Pallas top-k kernel parity tests (the QEMU-analog of SURVEY.md §4:
kernel parity Pallas-interpret vs jnp reference on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gorse_tpu.ops.topk import (
    PreparedItems,
    dot_topk,
    dot_topk_xla,
    prepare_items,
    topk_excluding,
)


def _check_parity(b, n, d, k, seed):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, d)).astype(np.float32)
    items = rng.normal(size=(n, d)).astype(np.float32)
    ref_s, ref_i = dot_topk_xla(jnp.asarray(q), jnp.asarray(items), k)
    got_s, got_i = dot_topk(jnp.asarray(q), jnp.asarray(items), k, interpret=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-5, atol=1e-5)
    # indices may differ on exact ties; scores matching is the contract.
    # verify indices produce the same scores
    recomputed = np.take_along_axis(q @ items.T, np.asarray(got_i), axis=1)
    np.testing.assert_allclose(recomputed, np.asarray(ref_s), rtol=1e-5, atol=1e-5)


def test_topk_parity_small():
    _check_parity(b=4, n=100, d=16, k=10, seed=0)


def test_topk_parity_unaligned():
    # deliberately awkward sizes: non-multiple of block/tile everywhere
    _check_parity(b=7, n=1333, d=37, k=13, seed=1)


def test_topk_parity_multi_block():
    _check_parity(b=8, n=2048, d=64, k=25, seed=2)


def test_topk_k_larger_than_block_boundary_cases():
    # all items requested
    rng = np.random.default_rng(3)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    items = rng.normal(size=(20, 8)).astype(np.float32)
    s, i = dot_topk(jnp.asarray(q), jnp.asarray(items), 20, interpret=True)
    full = np.sort(q @ items.T, axis=1)[:, ::-1]
    np.testing.assert_allclose(np.asarray(s), full, rtol=1e-5, atol=1e-5)


def test_topk_prepared_items_reuse():
    # the serving path: build the transposed table once, query it repeatedly
    rng = np.random.default_rng(5)
    q = rng.normal(size=(4, 24)).astype(np.float32)
    items = rng.normal(size=(500, 24)).astype(np.float32)
    prep = prepare_items(jnp.asarray(items))
    assert isinstance(prep, PreparedItems)
    assert prep.n_items == 500 and prep.dim == 24
    ref_s, ref_i = dot_topk_xla(jnp.asarray(q), jnp.asarray(items), 7)
    got_s, got_i = dot_topk(jnp.asarray(q), prep, 7, interpret=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_topk_prepared_bf16_near_exact():
    # bf16 table (the reference itself serves BF16 embeddings): scores match
    # within bf16 rounding and the top sets broadly agree
    rng = np.random.default_rng(6)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    items = rng.normal(size=(300, 32)).astype(np.float32)
    prep = prepare_items(jnp.asarray(items), jnp.bfloat16)
    ref_s, _ = dot_topk_xla(jnp.asarray(q), jnp.asarray(items), 10)
    got_s, got_i = dot_topk(jnp.asarray(q), prep, 10, interpret=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=0.05, atol=0.15)
    # recomputing the f32 scores of the returned indices stays close to ref
    rec = np.take_along_axis(q @ items.T, np.asarray(got_i), axis=1)
    np.testing.assert_allclose(rec, np.asarray(ref_s), rtol=0.05, atol=0.15)


def test_topk_excluding_prepared():
    rng = np.random.default_rng(7)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    items = rng.normal(size=(150, 16)).astype(np.float32)
    prep = prepare_items(jnp.asarray(items))
    s_p, i_p = topk_excluding(jnp.asarray(q), prep, 5, use_pallas=True, interpret=True)
    s_x, i_x = topk_excluding(jnp.asarray(q), prep, 5, use_pallas=False)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))


def test_topk_excluding():
    rng = np.random.default_rng(4)
    q = rng.normal(size=(5, 16)).astype(np.float32)
    items = rng.normal(size=(200, 16)).astype(np.float32)
    scores = q @ items.T
    # exclude each query's true top-2
    order = np.argsort(-scores, axis=1)
    exclude = order[:, :2].astype(np.int32)
    s, i = topk_excluding(
        jnp.asarray(q), jnp.asarray(items), 5, jnp.asarray(exclude),
        use_pallas=True, interpret=True,
    )
    for b in range(5):
        assert not (set(np.asarray(i[b]).tolist()) & set(exclude[b].tolist()))
        expect = [x for x in order[b] if x not in exclude[b]][:5]
        np.testing.assert_allclose(
            np.asarray(s[b]), scores[b, expect], rtol=1e-5, atol=1e-5
        )


def _check_exact_unique(q, items, k):
    """Parity + per-row index uniqueness (ties must not duplicate an item)."""
    ref_s, _ = dot_topk_xla(jnp.asarray(q), jnp.asarray(items), k)
    got_s, got_i = dot_topk(jnp.asarray(q), jnp.asarray(items), k, interpret=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-5, atol=1e-5)
    gi = np.asarray(got_i)
    for row in gi:
        assert len(set(row.tolist())) == len(row), f"duplicate indices in {row}"
    recomputed = np.take_along_axis(q @ items.T, gi, axis=1)
    np.testing.assert_allclose(recomputed, np.asarray(ref_s), rtol=1e-5, atol=1e-5)


def test_topk_massive_ties():
    """Quantized scores force ties within and across 128-lane chunks — the
    chunked extraction must never emit the same index twice."""
    rng = np.random.default_rng(7)
    q = np.eye(4, 8, dtype=np.float32)  # scores = item coordinates directly
    items = rng.integers(0, 3, size=(1000, 8)).astype(np.float32)  # few values
    _check_exact_unique(q, items, k=15)


def test_topk_hot_chunk_overflow():
    """>_T_UNROLL of one query's top-k inside a single 128-lane chunk drives
    the unrolled steps into the overflow loop with taken-lane consumption."""
    rng = np.random.default_rng(8)
    items = rng.normal(size=(512, 8)).astype(np.float32) * 0.01
    # plant the global top-8 (with two exact ties) in chunk 1, lanes 130..137
    q = np.ones((2, 8), dtype=np.float32)
    for rank, col in enumerate(range(130, 138)):
        items[col] = (100.0 - rank) / 8.0
    items[137] = items[136]  # exact tie inside the hot chunk
    _check_exact_unique(q, items, k=8)


def test_topk_hot_block_spread_chunks():
    """Top-k concentrated in ONE block but spread across its chunks —
    exercises repeated chunk-max updates + cross-chunk selection."""
    rng = np.random.default_rng(9)
    items = rng.normal(size=(8192, 16)).astype(np.float32) * 0.01
    q = np.ones((3, 16), dtype=np.float32)
    hot = [5, 200, 300, 700, 900, 1100, 1900, 2047, 2048, 2100]
    for rank, col in enumerate(hot):
        items[col] = (50.0 - rank) / 16.0
    _check_exact_unique(q, items, k=10)


def test_topk_seeded_matches_unseeded_many_blocks():
    """Both kernel variants (bound-seeded two-pass and single-pass) must
    agree with XLA on a grid with many item blocks — the shape class where
    the r1 seeded kernel's (B, 1) block specs failed to lower on real TPU
    (lane dims must be 128-divisible or span the array)."""
    rng = np.random.default_rng(9)
    q = rng.normal(size=(16, 32)).astype(np.float32)
    items = rng.normal(size=(3000, 32)).astype(np.float32)
    ref_s, _ = dot_topk_xla(jnp.asarray(q), jnp.asarray(items), 12)
    for seeded in (True, False):
        s, i = dot_topk(
            jnp.asarray(q), jnp.asarray(items), 12,
            block_n=256, interpret=True, seeded=seeded,
        )
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), rtol=1e-5, atol=1e-5)
        recomputed = np.take_along_axis(q @ items.T, np.asarray(i), axis=1)
        np.testing.assert_allclose(recomputed, np.asarray(ref_s), rtol=1e-5, atol=1e-5)


def test_topk_seeded_duplicate_scores():
    """Ties across blocks stress the one-ulp seed nudge: entries equal to
    the seed must still insert."""
    q = np.ones((4, 8), np.float32)
    items = np.repeat(np.eye(8, dtype=np.float32), 40, axis=0)  # 320 rows, all dot=1
    for seeded in (True, False):
        s, _ = dot_topk(jnp.asarray(q), jnp.asarray(items), 5,
                        block_n=128, interpret=True, seeded=seeded)
        np.testing.assert_allclose(np.asarray(s), 1.0)


def test_sq_topk_pallas_matches_xla_dot():
    """The PreparedSQ Pallas path (uint8 blocks + affine matmul epilogue)
    must rank identically to the XLA sq formulation on the same codes; score
    values agree to bf16-matmul tolerance (the Pallas path rounds q to bf16,
    the XLA path keeps q f32)."""
    import jax
    import jax.numpy as jnp

    from gorse_tpu.ops.topk import dot_topk_xla, prepare_sq_items, sq_topk

    rng = np.random.default_rng(5)
    n, d, b, k = 700, 32, 12, 9
    items = rng.normal(size=(n, d)).astype(np.float32)
    minv = items.min(axis=1)
    scale = (items.max(axis=1) - minv) / 255.0
    codes = np.clip(np.rint((items - minv[:, None]) / scale[:, None]), 0, 255).astype(np.uint8)
    deq = minv[:, None] + scale[:, None] * codes.astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)

    prep = prepare_sq_items(
        jnp.asarray(codes), jnp.asarray(scale), jnp.asarray(minv)
    )
    s, i = sq_topk(jnp.asarray(queries), prep, k_top=k, interpret=True)
    # reference: exact top-k over the dequantized rows with bf16-rounded q
    rs, ri = dot_topk_xla(
        jnp.asarray(queries).astype(jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(deq), k,
    )
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=2e-2, atol=2e-2)


def test_sq_topk_pallas_euclidean():
    """Euclidean metric through the Pallas sq path: negative squared
    distances, needs the norms2 affine row."""
    import jax.numpy as jnp

    from gorse_tpu.ops.topk import prepare_sq_items, sq_topk

    rng = np.random.default_rng(6)
    n, d, b, k = 300, 16, 6, 5
    items = rng.normal(size=(n, d)).astype(np.float32)
    minv = items.min(axis=1)
    scale = (items.max(axis=1) - minv) / 255.0
    codes = np.clip(np.rint((items - minv[:, None]) / scale[:, None]), 0, 255).astype(np.uint8)
    deq = minv[:, None] + scale[:, None] * codes.astype(np.float32)
    norms2 = (deq * deq).sum(axis=1)
    queries = rng.normal(size=(b, d)).astype(np.float32)

    prep = prepare_sq_items(
        jnp.asarray(codes), jnp.asarray(scale), jnp.asarray(minv),
        norms2=jnp.asarray(norms2),
    )
    s, i = sq_topk(jnp.asarray(queries), prep, k_top=k, metric="euclidean", interpret=True)
    # brute-force reference with bf16-rounded q (matching the kernel matmul)
    qb = np.asarray(jnp.asarray(queries).astype(jnp.bfloat16).astype(jnp.float32))
    d2 = ((qb[:, None, :] - deq[None, :, :]) ** 2).sum(axis=2)
    for row in range(b):
        order = np.argsort(d2[row])[:k]
        got = np.asarray(i)[row]
        # rankings agree (allow ties to permute within equal distances)
        np.testing.assert_allclose(
            np.sort(d2[row][got]), np.sort(d2[row][order]), rtol=2e-2, atol=5e-2
        )

    # ADVICE r3 #2 regression: a PreparedSQ built WITHOUT norms2 must refuse
    # euclidean (affine row 2 is all zeros -> silently wrong ranking)
    bare = prepare_sq_items(jnp.asarray(codes), jnp.asarray(scale), jnp.asarray(minv))
    with pytest.raises(ValueError, match="norms2"):
        sq_topk(jnp.asarray(queries), bare, k_top=k, metric="euclidean", interpret=True)



def test_dot_topk_chunks_large_batches():
    """Batches above the 256-row design point are chunked internally
    (VERDICT r3 weak #4: B=1024 silently ran 3x slower through the
    scoped-VMEM block_n cap) — results must equal the XLA reference."""
    from gorse_tpu.ops.topk import dot_topk, dot_topk_xla, prepare_items

    rng = np.random.default_rng(12)
    items = rng.normal(size=(2048, 32)).astype(np.float32)
    queries = rng.normal(size=(600, 32)).astype(np.float32)  # 3 chunks, ragged tail
    prep = prepare_items(jnp.asarray(items))
    s, i = dot_topk(jnp.asarray(queries), prep, 7, interpret=True)
    xs, xi = dot_topk_xla(jnp.asarray(queries), jnp.asarray(items), 7)
    np.testing.assert_allclose(np.asarray(s), np.asarray(xs), rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(i), np.asarray(xi))


def test_sq_topk_prepared_chunks_large_batches():
    from gorse_tpu.ops.topk import dot_topk_xla, prepare_sq_items, sq_topk

    rng = np.random.default_rng(13)
    items = rng.normal(size=(1024, 16)).astype(np.float32)
    minv = items.min(axis=1)
    scale = (items.max(axis=1) - minv) / 255.0
    codes = np.clip(np.rint((items - minv[:, None]) / scale[:, None]), 0, 255).astype(np.uint8)
    deq = minv[:, None] + scale[:, None] * codes.astype(np.float32)
    queries = rng.normal(size=(300, 16)).astype(np.float32)
    prep = prepare_sq_items(jnp.asarray(codes), jnp.asarray(scale), jnp.asarray(minv))
    s, i = sq_topk(jnp.asarray(queries), prep, k_top=5, interpret=True)
    xs, xi = dot_topk_xla(jnp.asarray(queries), jnp.asarray(deq), 5)
    # bf16 matmul tolerance on scores; index sets nearly identical
    for b in range(300):
        assert len(set(np.asarray(i)[b]) & set(np.asarray(xi)[b])) >= 4


def test_dot_topk_approx_matches_exact_small():
    """Approximate tier (ops/topk.dot_topk_approx — the HNSW analog): on
    small catalogs / CPU lowering it should essentially coincide with the
    exact kernel; padding columns must never be returned."""
    import numpy as np

    from gorse_tpu.ops.topk import dot_topk_approx, dot_topk_xla, prepare_items

    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(1000, 32)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    prep = prepare_items(items, jnp.bfloat16)
    av, ai = dot_topk_approx(queries, prep, 10, recall_target=0.99)
    assert int(jnp.max(ai)) < 1000  # lane padding masked out
    # bf16 scoring reference
    xs, xi = dot_topk_xla(queries.astype(jnp.bfloat16).astype(jnp.float32),
                          np.asarray(items, np.float32), 10)
    ein, ain = np.asarray(xi), np.asarray(ai)
    recall = np.mean([len(set(ein[b]) & set(ain[b])) / 10 for b in range(16)])
    assert recall >= 0.9, recall


def test_topk_excluding_approx_route():
    import numpy as np

    from gorse_tpu.ops.topk import topk_excluding

    rng = np.random.default_rng(1)
    items = jnp.asarray(rng.normal(size=(500, 16)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    s1, i1 = topk_excluding(queries, items, 5, use_pallas=False)
    exclude = i1[:, :2]  # ban each query's top-2
    s2, i2 = topk_excluding(
        queries, items, 5, exclude=exclude, use_pallas=False, approx_recall=0.99
    )
    i2 = np.asarray(i2)
    for b in range(4):
        banned = set(np.asarray(exclude)[b].tolist())
        assert not (set(i2[b].tolist()) & banned)


def test_cf_index_search_approx_recall():
    """search_users(approx_recall=...) returns the same top items as the
    exact path on a small catalog (CPU lowering of approx_max_k)."""
    import numpy as np

    from gorse_tpu.data.dict import FreqDict
    from gorse_tpu.logics.cf import MatrixFactorizationIndex

    rng = np.random.default_rng(2)
    n_u, n_i, k = 12, 200, 8
    users = FreqDict()
    items = FreqDict()
    for u in range(n_u):
        users.add(f"u{u}")
    for i in range(n_i):
        items.add(f"i{i}")
    idx = MatrixFactorizationIndex(
        rng.normal(size=(n_u, k)).astype(np.float32),
        rng.normal(size=(n_i, k)).astype(np.float32),
        users, items,
    )
    uid_list = [f"u{u}" for u in range(n_u)]
    exact = idx.search_users(uid_list, 5, use_pallas=False)
    approx = idx.search_users(uid_list, 5, use_pallas=False, approx_recall=0.99)
    for e_row, a_row in zip(exact, approx):
        e_ids = {s.id for s in e_row}
        a_ids = {s.id for s in a_row}
        assert len(e_ids & a_ids) >= 4  # >=80% overlap at this tiny scale


def test_sq_topk_approx_matches_exact_small():
    """Quantized approximate tier: high overlap with the exact sq path on a
    small catalog; euclidean requires norms2 exactly like the exact path."""
    import numpy as np
    import pytest as _pytest

    from gorse_tpu.ops.topk import prepare_sq_items, sq_topk, sq_topk_approx

    rng = np.random.default_rng(3)
    items = rng.normal(size=(800, 32)).astype(np.float32)
    queries = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    minv = items.min(axis=1)
    scale = (items.max(axis=1) - minv) / 255.0
    codes = np.clip(np.round((items - minv[:, None]) / scale[:, None]), 0, 255)
    prep = prepare_sq_items(
        jnp.asarray(codes.astype(np.uint8)), jnp.asarray(scale), jnp.asarray(minv)
    )
    es, ei = sq_topk(queries, prep, k_top=10, interpret=True)
    av, ai = sq_topk_approx(queries, prep, 10, recall_target=0.99)
    assert int(jnp.max(ai)) < 800
    ein, ain = np.asarray(ei), np.asarray(ai)
    rec = np.mean([len(set(ein[b]) & set(ain[b])) / 10 for b in range(8)])
    assert rec >= 0.9, rec
    with _pytest.raises(ValueError):
        sq_topk_approx(queries, prep, 10, metric="euclidean")
