"""Catalog-sharded training (parallel/catalog.py): routing correctness,
a2a gather/scatter parity, and full-epoch parity of the catalog-sharded
BPR/eALS paths against the replicated sharded paths on an 8-device CPU mesh
(SURVEY §2.7's owed model-parallel embedding tables, VERDICT r4 next #2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gorse_tpu.parallel import make_mesh
from gorse_tpu.parallel.catalog import (
    a2a_gather,
    a2a_scatter_add,
    exchange_bytes_per_step,
    make_catalog_sharded_als_epoch,
    make_catalog_sharded_bpr_epoch,
    pack_catalog,
    request_cap,
    route_requests,
    shard_catalog_als_inputs,
    shard_catalog_bpr_inputs,
    unpack_catalog,
)
from gorse_tpu.parallel.sharded import (
    make_sharded_als_epoch,
    make_sharded_bpr_epoch,
    place_global,
    shard_als_inputs,
    shard_bpr_inputs,
)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


def test_route_requests_places_every_valid_id():
    d, cap, n = 4, 8, 20
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 32, n).astype(np.int32))
    valid = jnp.asarray(rng.random(n) < 0.8)
    buf, sowner, srank, order, kept, n_dropped = jax.jit(
        route_requests, static_argnums=(2, 3)
    )(ids, valid, d, cap)
    buf = np.asarray(buf)
    assert int(n_dropped) == 0  # cap generous
    # every valid id appears exactly once, in its owner's row
    placed = []
    for dev in range(d):
        for v in buf[dev]:
            if v >= 0:
                assert v % d == dev
                placed.append(int(v))
    want = sorted(int(i) for i, ok in zip(np.asarray(ids), np.asarray(valid)) if ok)
    assert sorted(placed) == want


def test_route_requests_overflow_counted():
    d, cap = 2, 4
    ids = jnp.zeros(16, jnp.int32)  # all owned by device 0
    valid = jnp.ones(16, bool)
    buf, _, _, _, _, n_dropped = jax.jit(route_requests, static_argnums=(2, 3))(
        ids, valid, d, cap
    )
    assert int(n_dropped) == 16 - cap
    assert int((np.asarray(buf) >= 0).sum()) == cap


def test_pack_unpack_catalog_roundtrip():
    rng = np.random.default_rng(1)
    for i_total, d in [(17, 4), (32, 8), (7, 8)]:
        t = rng.normal(size=(i_total, 3)).astype(np.float32)
        packed = pack_catalog(t, d)
        assert packed.shape[0] % d == 0
        np.testing.assert_array_equal(unpack_catalog(packed, i_total, d), t)


def _run_sharded(mesh, fn, in_specs, out_specs, *args):
    axes = tuple(mesh.axis_names)
    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=False)
    )(*args)


def test_a2a_gather_matches_dense_lookup(mesh8):
    d = mesh8.size
    axes = tuple(mesh8.axis_names)
    rng = np.random.default_rng(2)
    i_total, k = 40, 8
    table = rng.normal(size=(i_total, k)).astype(np.float32)
    n_per_dev = 6
    ids_np = rng.integers(0, i_total, d * n_per_dev).astype(np.int32)
    valid_np = rng.random(d * n_per_dev) < 0.9
    cap = request_cap(n_per_dev, d, slack=8.0)  # generous: no drops

    q_shard = place_global(mesh8, pack_catalog(table, d), P(axes, None))
    ids = place_global(mesh8, ids_np, P(axes))
    valid = place_global(mesh8, valid_np, P(axes))

    def body(q_shard, ids, valid):
        rows, got, n_drop = a2a_gather(q_shard, ids, valid, axes, d, cap)
        return rows, got, jax.lax.psum(n_drop, axes)

    rows, got, n_drop = _run_sharded(
        mesh8, body,
        (P(axes, None), P(axes), P(axes)), (P(axes, None), P(axes), P()),
        q_shard, ids, valid,
    )
    assert int(np.asarray(n_drop).reshape(-1)[0]) == 0
    rows, got = np.asarray(rows), np.asarray(got)
    np.testing.assert_array_equal(got, valid_np)
    np.testing.assert_allclose(
        rows[valid_np], table[ids_np[valid_np]], rtol=1e-6
    )
    assert np.all(rows[~valid_np] == 0.0)


def test_a2a_scatter_add_matches_dense_scatter(mesh8):
    d = mesh8.size
    axes = tuple(mesh8.axis_names)
    rng = np.random.default_rng(3)
    i_total, k = 40, 8
    table = rng.normal(size=(i_total, k)).astype(np.float32)
    n_per_dev = 6
    ids_np = rng.integers(0, i_total, d * n_per_dev).astype(np.int32)
    valid_np = rng.random(d * n_per_dev) < 0.9
    deltas_np = rng.normal(size=(d * n_per_dev, k)).astype(np.float32)
    cap = request_cap(n_per_dev, d, slack=8.0)

    q_shard = place_global(mesh8, pack_catalog(table, d), P(axes, None))
    ids = place_global(mesh8, ids_np, P(axes))
    valid = place_global(mesh8, valid_np, P(axes))
    deltas = place_global(mesh8, deltas_np, P(axes, None))

    def body(q_shard, ids, valid, deltas):
        return a2a_scatter_add(q_shard, ids, valid, deltas, axes, d, cap)

    out = _run_sharded(
        mesh8, body,
        (P(axes, None), P(axes), P(axes), P(axes, None)), P(axes, None),
        q_shard, ids, valid, deltas,
    )
    got = unpack_catalog(np.asarray(out), i_total, d)
    want = table.copy()
    for i, ok, dl in zip(ids_np, valid_np, deltas_np):
        if ok:
            want[i] += dl
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _bpr_fixture(mesh, seed=0):
    from gorse_tpu.data import synthetic_cf
    from gorse_tpu.models import BPR, Params

    data = synthetic_cf(n_users=96, n_items=40, rank=4, density=0.15, seed=seed)
    train, _ = data.split_cf(seed=0)
    model = BPR(Params(n_factors=8))
    model.init(train)
    csr = train.padded_user_positives(pad_to=24)
    return train, model, csr


def test_catalog_bpr_epoch_matches_replicated(mesh8):
    """Same threefry sampling → identical pairs; catalog-sharded updates must
    match the replicated psum path up to FP reduction order."""
    train, model, csr = _bpr_fixture(mesh8)
    n_items = train.count_items()
    key = jax.random.PRNGKey(7)

    rep_epoch = make_sharded_bpr_epoch(
        mesh8, n_steps=6, n_items=n_items, lr=0.05, reg=0.01
    )
    p1, q1, pp, pc, uids, n_users = shard_bpr_inputs(
        mesh8, model.user_factors, model.item_factors, csr.padded, csr.counts
    )
    p1, q1, cost1 = rep_epoch(p1, q1, pp, pc, uids, key)

    cat_epoch = make_catalog_sharded_bpr_epoch(
        mesh8, n_steps=6, n_items=n_items, lr=0.05, reg=0.01, slack=16.0
    )
    p2, q2, pp2, pc2, uids2, _, _ = shard_catalog_bpr_inputs(
        mesh8, model.user_factors, model.item_factors, csr.padded, csr.counts
    )
    p2, q2, stats = cat_epoch(p2, q2, pp2, pc2, uids2, key)
    cost2, dropped = np.asarray(stats)[:2]
    assert dropped == 0
    np.testing.assert_allclose(float(cost1[0]), float(cost2), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p1)[:n_users], np.asarray(p2)[:n_users], rtol=2e-4, atol=1e-6
    )
    q2_dense = unpack_catalog(np.asarray(q2), n_items, mesh8.size)
    np.testing.assert_allclose(np.asarray(q1), q2_dense, rtol=2e-4, atol=1e-6)


def test_catalog_bpr_epoch_overflow_drops_but_trains(mesh8):
    """A deliberately tiny cap drops requests — the epoch must report them
    and still produce finite factors (bounded, observable raggedness; the
    reference's hogwild analog is silent, model/cf/model.go:448-490)."""
    train, model, csr = _bpr_fixture(mesh8, seed=1)
    n_items = train.count_items()
    cat_epoch = make_catalog_sharded_bpr_epoch(
        mesh8, n_steps=4, n_items=n_items, lr=0.05, reg=0.01, cap=1,
    )
    p, q, pp, pc, uids, _, _ = shard_catalog_bpr_inputs(
        mesh8, model.user_factors, model.item_factors, csr.padded, csr.counts
    )
    p, q, stats = cat_epoch(p, q, pp, pc, uids, jax.random.PRNGKey(0))
    cost, dropped = np.asarray(stats)[:2]
    assert np.isfinite(cost)
    assert dropped > 0  # ~3 requests per destination on average, cap=1
    assert np.isfinite(np.asarray(p)).all() and np.isfinite(np.asarray(q)).all()


def test_catalog_bpr_sharding_invariance():
    """The catalog-sharded epoch must agree across DIFFERENT device counts
    (threefry keyed on global user id; routing is pure plumbing)."""
    results = {}
    for d in (2, 8):
        mesh = make_mesh(d)
        train, model, csr = _bpr_fixture(mesh, seed=2)
        n_items = train.count_items()
        epoch = make_catalog_sharded_bpr_epoch(
            mesh, n_steps=4, n_items=n_items, lr=0.05, reg=0.01, slack=16.0
        )
        p, q, pp, pc, uids, n_users, _ = shard_catalog_bpr_inputs(
            mesh, model.user_factors, model.item_factors, csr.padded, csr.counts
        )
        p, q, stats = epoch(p, q, pp, pc, uids, jax.random.PRNGKey(3))
        results[d] = (
            np.asarray(p)[:n_users],
            unpack_catalog(np.asarray(q), n_items, d),
            float(np.asarray(stats)[0]),
        )
    np.testing.assert_allclose(results[2][0], results[8][0], rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(results[2][1], results[8][1], rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(results[2][2], results[8][2], rtol=1e-4)


def test_catalog_als_epoch_matches_replicated(mesh8):
    """Partial-Gram psum + sharded-between-half-epochs factors must match
    the replicated-Gram sharded path (identical math, different schedule)."""
    from gorse_tpu.data import synthetic_cf
    from gorse_tpu.models import BPR, Params

    data = synthetic_cf(n_users=64, n_items=48, rank=4, density=0.2, seed=3)
    train, _ = data.split_cf(seed=0)
    model = BPR(Params(n_factors=8))
    model.init(train)
    user_csr = train.padded_user_positives()
    item_csr = train.padded_item_positives()
    block = 8

    rep = make_sharded_als_epoch(mesh8, block=block, alpha=0.05, reg=0.015)
    q0, ufb, ifb, umask, imask, n_users, n_items = shard_als_inputs(
        mesh8, model.item_factors, user_csr.padded, item_csr.padded, block
    )
    p1, q1 = rep(q0, ufb, ifb, umask, imask)

    cat = make_catalog_sharded_als_epoch(mesh8, block=block, alpha=0.05, reg=0.015)
    p0s, q0s, ufb2, ifb2, umask2, imask2, _, _ = shard_catalog_als_inputs(
        mesh8, model.user_factors, model.item_factors,
        user_csr.padded, item_csr.padded, block,
    )
    p2, q2 = cat(p0s, q0s, ufb2, ifb2, umask2, imask2)

    np.testing.assert_allclose(
        np.asarray(p1)[:n_users], np.asarray(p2)[:n_users], rtol=5e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(q1)[:n_items], np.asarray(q2)[:n_items], rtol=5e-4, atol=1e-5
    )


def test_exchange_bytes_and_cap_properties():
    k = 64
    # payload is a function of (requests, devices, k) ONLY — there is no
    # catalog-size argument at all, by construction; pin the scaling shape:
    # linear in the request count (beyond the small-set exactness floor)
    b1 = exchange_bytes_per_step(2 * 10_000, 8, k)
    b4 = exchange_bytes_per_step(8 * 10_000, 8, k)
    assert 3.5 * b1 <= b4 <= 4.5 * b1
    # far below the replicated psum's dense [I, k] payload at a 1M catalog
    assert b1 < 1_000_000 * k * 4
    # cap: worst-case-exact for small request sets, slack-scaled above
    assert request_cap(24, 8) == 24  # exactness floor (<=512 slots)
    big = request_cap(2 * 1_000_000, 8, slack=2.0)
    assert 2 * 1_000_000 / 8 <= big <= 2 * 1_000_000 / 8 * 2.1


def test_sharded_table_afm_matches_dense_sgd(mesh8):
    """AFM with the feature table row-sharded (a2a gathers per batch) must
    reproduce the single-device fit (SURVEY §7 hard-part #4). SGD: updates
    are linear in the gradients, so the only divergence source is FP
    reduction order — tight tolerance."""
    from gorse_tpu.data.ctr import synthetic_ctr
    from gorse_tpu.models.fm import AFM
    from gorse_tpu.models.params import FitConfig, Params as MParams

    ctr = synthetic_ctr(n_samples=512, n_users=32, n_items=24, seed=0)
    train, test = ctr.split(0.25, seed=1)
    p = MParams(n_factors=8, n_epochs=3, batch_size=32, optimizer="sgd", lr=0.05)

    dense = AFM(p)
    s_dense = dense.fit(train, test, FitConfig(verbose=0))

    sharded = AFM(p)
    s_sharded = sharded.fit(
        train, test, FitConfig(verbose=0, mesh=mesh8, shard_table=True)
    )
    assert float(np.asarray(sharded.table_drop_count)) == 0.0

    np.testing.assert_allclose(
        np.asarray(dense.model_params["v"]),
        np.asarray(sharded.model_params["v"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dense.model_params["w"]),
        np.asarray(sharded.model_params["w"]),
        rtol=1e-4, atol=1e-6,
    )
    for c, att in enumerate(dense.model_params["att"]):
        for key in att:
            np.testing.assert_allclose(
                np.asarray(att[key]),
                np.asarray(sharded.model_params["att"][c][key]),
                rtol=1e-4, atol=1e-6,
            )
    assert abs(s_dense.auc - s_sharded.auc) < 5e-3


def test_sharded_table_afm_adam_functional_parity(mesh8):
    """Adam amplifies FP reduction-order noise (rsqrt-normalized first
    steps), so exact-parity is out of reach by design — assert the loss at
    step 1 matches tightly (pre-Adam-amplification) and the final fit is
    functionally equivalent (AUC)."""
    from gorse_tpu.data.ctr import synthetic_ctr
    from gorse_tpu.models.fm import AFM
    from gorse_tpu.models.params import FitConfig, Params as MParams

    ctr = synthetic_ctr(n_samples=512, n_users=32, n_items=24, seed=0)
    train, test = ctr.split(0.25, seed=1)
    p = MParams(n_factors=8, n_epochs=5, batch_size=32)

    dense = AFM(p)
    s_dense = dense.fit(train, test, FitConfig(verbose=0))
    sharded = AFM(p)
    s_sharded = sharded.fit(
        train, test, FitConfig(verbose=0, mesh=mesh8, shard_table=True)
    )
    assert float(np.asarray(sharded.table_drop_count)) == 0.0
    assert abs(s_dense.auc - s_sharded.auc) < 1e-2
    assert abs(s_dense.accuracy - s_sharded.accuracy) < 2e-2


def test_bpr_fit_with_catalog_sharding(mesh8):
    """BPR.fit(shard_table=True): end-to-end training with the item table
    row-sharded; factors come back dense and the fit learns."""
    from gorse_tpu.data import synthetic_cf
    from gorse_tpu.models import BPR, Params
    from gorse_tpu.models.params import FitConfig

    data = synthetic_cf(n_users=96, n_items=64, rank=4, density=0.15, seed=4)
    train, test = data.split_cf(seed=0)
    model = BPR(Params(n_factors=8, n_epochs=20, lr=0.05, reg=0.01))
    score = model.fit(
        train, test, FitConfig(verbose=0, mesh=mesh8, shard_table=True)
    )
    assert model.item_factors.shape == (train.count_items(), 8)
    assert model.user_factors.shape == (train.count_users(), 8)
    assert float(np.asarray(model.catalog_drop_count)) == 0.0
    # identical sampling to the replicated sharded path -> same quality
    model2 = BPR(Params(n_factors=8, n_epochs=20, lr=0.05, reg=0.01))
    score2 = model2.fit(train, test, FitConfig(verbose=0, mesh=mesh8))
    assert abs(score.ndcg - score2.ndcg) < 0.02, (score.ndcg, score2.ndcg)


def test_als_fit_with_catalog_sharding(mesh8):
    """ALS.fit(shard_table=True): both factor tables stay sharded between
    half-epochs; result matches the replicated-table sharded fit."""
    from gorse_tpu.data import synthetic_cf
    from gorse_tpu.models import ALS, Params
    from gorse_tpu.models.params import FitConfig

    data = synthetic_cf(n_users=64, n_items=48, rank=4, density=0.2, seed=5)
    train, test = data.split_cf(seed=0)
    kw = dict(n_factors=8, n_epochs=5, reg=0.015, alpha=0.05, solve_block=8)
    m1 = ALS(Params(**kw))
    s1 = m1.fit(train, test, FitConfig(verbose=0, mesh=mesh8))
    m2 = ALS(Params(**kw))
    s2 = m2.fit(train, test, FitConfig(verbose=0, mesh=mesh8, shard_table=True))
    np.testing.assert_allclose(
        np.asarray(m1.item_factors), np.asarray(m2.item_factors),
        rtol=5e-4, atol=1e-5,
    )
    assert abs(s1.ndcg - s2.ndcg) < 1e-3


def test_sharded_afm_padding_slots_not_routed(mesh8):
    """Sparse rows pad unused slots with (id 0, value 0); those slots must
    NOT be routed (they would all hit id 0's owner and overflow its cap,
    silently masking real samples). Zero-valued slots contribute nothing to
    the AFM forward or gradient, so skipping their gathers is exact."""
    import optax

    from gorse_tpu.models.fm import AFM, _afm_train_epoch
    from gorse_tpu.models.params import Params as MParams
    from gorse_tpu.parallel.catalog import (
        make_sharded_afm_epoch,
        shard_afm_params,
        unshard_afm_params,
    )
    from gorse_tpu.parallel.sharded import shard_afm_batches

    rng = np.random.default_rng(7)
    n_feat, dmax, batch, s_steps, k = 64, 12, 16, 3, 8
    # heavily padded: each sample uses only 3 of 12 slots
    idx = np.zeros((s_steps, batch, dmax), np.int32)
    val = np.zeros((s_steps, batch, dmax), np.float32)
    for s in range(s_steps):
        for b in range(batch):
            feats = rng.choice(n_feat, 3, replace=False)
            idx[s, b, :3] = feats
            val[s, b, :3] = 1.0
    tgt = rng.integers(0, 2, (s_steps, batch)).astype(np.float32)
    wgt = np.ones((s_steps, batch), np.float32)
    batches = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(tgt),
               jnp.asarray(wgt), ())

    m = AFM(MParams(n_factors=k, optimizer="sgd", lr=0.05))
    params = m._init_params(n_feat, [], 0)
    tx = m._make_optimizer()

    p_dense, _, c_dense = _afm_train_epoch(
        jax.tree.map(jnp.array, params), tx.init(params), *batches, optimizer=tx
    )

    sp = shard_afm_params(mesh8, params)
    ep = make_sharded_afm_epoch(mesh8, tx)  # default slack — tight cap
    sp, _, c_shard, dropped = ep(sp, tx.init(sp), *shard_afm_batches(mesh8, batches))
    assert float(dropped) == 0.0  # padding slots never requested
    p_shard = unshard_afm_params(mesh8, sp, n_feat, k)
    np.testing.assert_allclose(float(c_dense), float(c_shard), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p_dense["v"]), np.asarray(p_shard["v"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p_dense["w"]), np.asarray(p_shard["w"]), rtol=1e-4, atol=1e-6
    )
