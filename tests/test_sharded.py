"""Sharded training/retrieval tests on the 8-device virtual CPU mesh
(the mockMaster analog, SURVEY.md §4): sharding must change the schedule,
not the math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gorse_tpu.data import synthetic_cf
from gorse_tpu.parallel.mesh import make_mesh
from gorse_tpu.parallel.sharded import (
    make_sharded_bpr_epoch,
    make_sharded_topk,
    shard_bpr_inputs,
)


@pytest.fixture(scope="module")
def setup():
    data = synthetic_cf(n_users=93, n_items=70, rank=4, density=0.15, seed=3)
    train, _ = data.split_cf(seed=0)
    csr = train.padded_user_positives()
    rng = np.random.default_rng(0)
    p0 = rng.normal(scale=0.01, size=(train.count_users(), 8)).astype(np.float32)
    q0 = rng.normal(scale=0.01, size=(train.count_items(), 8)).astype(np.float32)
    return train, csr, p0, q0


def _run(mesh, setup, n_steps=5):
    train, csr, p0, q0 = setup
    epoch = make_sharded_bpr_epoch(
        mesh, n_steps=n_steps, n_items=train.count_items(), lr=0.05, reg=0.01
    )
    p, q, pp, pc, uids, n_users = shard_bpr_inputs(mesh, p0, q0, csr.padded, csr.counts)
    p, q, cost = epoch(p, q, pp, pc, uids, jax.random.PRNGKey(7))
    return np.asarray(p)[:n_users], np.asarray(q), float(cost[0])


def test_sharded_epoch_matches_single_device(setup):
    mesh1 = make_mesh(1)
    mesh8 = make_mesh(8)
    p1, q1, c1 = _run(mesh1, setup)
    p8, q8, c8 = _run(mesh8, setup)
    # counter-based sampling -> identical samples; only FP summation order
    # differs between shardings
    np.testing.assert_allclose(p1, p8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(q1, q8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c1, c8, rtol=1e-5)


def test_sharded_epoch_learns(setup):
    train, csr, p0, q0 = setup
    mesh = make_mesh(8)
    epoch = make_sharded_bpr_epoch(
        mesh, n_steps=20, n_items=train.count_items(), lr=0.05, reg=0.01
    )
    p, q, pp, pc, uids, n_users = shard_bpr_inputs(mesh, p0, q0, csr.padded, csr.counts)
    key = jax.random.PRNGKey(0)
    costs = []
    for e in range(15):
        key, ke = jax.random.split(key)
        p, q, cost = epoch(p, q, pp, pc, uids, ke)
        costs.append(float(cost[0]))
    assert costs[-1] < costs[0] - 1.0, costs  # BPR loss decreasing


def test_sharded_topk_matches_dense(setup):
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    queries = rng.normal(size=(6, 16)).astype(np.float32)
    items = rng.normal(size=(8 * 13, 16)).astype(np.float32)  # divisible by 8
    topk = make_sharded_topk(mesh, k_top=7)
    s, i = topk(jnp.asarray(queries), jnp.asarray(items))
    scores = queries @ items.T
    for b in range(6):
        order = np.argsort(-scores[b])[:7]
        np.testing.assert_allclose(np.asarray(s)[b], scores[b, order], rtol=1e-5)
        # recomputed scores at returned indices match exactly
        np.testing.assert_allclose(
            scores[b, np.asarray(i)[b]], scores[b, order], rtol=1e-5
        )


def test_sharded_fused_kernel_matches_xla_path():
    """The fused-Pallas sharded epoch (make_sharded_bpr_epoch_fused,
    interpret mode on the CPU mesh) produces the same result as the XLA
    sharded epoch: sampling is counter-based so the samples are identical,
    and the kernel computes the same update in f32."""
    import jax.numpy as jnp

    from gorse_tpu.ops.bpr_kernel import pack_items, unpack_items
    from gorse_tpu.parallel import make_mesh
    from gorse_tpu.parallel.sharded import (
        make_sharded_bpr_epoch,
        make_sharded_bpr_epoch_fused,
        shard_bpr_inputs,
    )

    n_users, n_items, k = 96, 64, 16
    rng = np.random.default_rng(3)
    counts = rng.integers(1, 12, size=n_users).astype(np.int32)
    padded = np.full((n_users, 16), -1, dtype=np.int32)
    for u in range(n_users):
        padded[u, : counts[u]] = rng.choice(n_items, size=counts[u], replace=False)
    p0 = rng.normal(scale=0.01, size=(n_users, k)).astype(np.float32)
    q0 = rng.normal(scale=0.01, size=(n_items, k)).astype(np.float32)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(4)
    p, q, pp, pc, uids, _ = shard_bpr_inputs(mesh, p0, q0, padded, counts)
    epoch_xla = make_sharded_bpr_epoch(mesh, n_steps=5, n_items=n_items, lr=0.05, reg=0.01)
    p_x, q_x, cost_x = epoch_xla(p, q, pp, pc, uids, key)

    p, q, pp, pc, uids, _ = shard_bpr_inputs(mesh, p0, q0, padded, counts)
    qp = jax.device_put(
        pack_items(jnp.asarray(q0)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    epoch_fused = make_sharded_bpr_epoch_fused(
        mesh, n_steps=5, n_items=n_items, lr=0.05, reg=0.01, interpret=True
    )
    p_f, qp_f, cost_f = epoch_fused(p, qp, pp, pc, uids, key)
    q_f = unpack_items(qp_f, n_items, k)

    np.testing.assert_allclose(np.asarray(cost_f), np.asarray(cost_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_x), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_x), rtol=2e-5, atol=1e-7)


def test_sharded_als_epoch_matches_single_device():
    """Sharded eALS: row-sharded ridge solves + all_gather must match the
    single-device _als_solve_side epoch (identical math, FP order aside)."""
    from gorse_tpu.models.als import _als_solve_side
    from gorse_tpu.parallel import make_mesh
    from gorse_tpu.parallel.sharded import make_sharded_als_epoch, shard_als_inputs

    data = synthetic_cf(n_users=57, n_items=41, rank=4, density=0.2, seed=5)
    train, _ = data.split_cf(seed=0)
    n_users, n_items = train.count_users(), train.count_items()
    rng = np.random.default_rng(2)
    q0 = rng.normal(scale=0.1, size=(n_items, 8)).astype(np.float32)
    user_fb = train.padded_user_positives().padded
    item_fb = train.padded_item_positives().padded
    block, alpha, reg = 8, 0.05, 0.015

    # single-device reference epoch (pad rows to the block multiple)
    def pad(x):
        pad_n = (-x.shape[0]) % block
        return np.concatenate(
            [x, np.full((pad_n,) + x.shape[1:], -1, dtype=x.dtype)], axis=0
        )

    imask_ref = jnp.asarray((item_fb[:, 0] >= 0).astype(np.float32))
    umask_ref = jnp.asarray((pad(user_fb)[:, 0] >= 0).astype(np.float32))
    p_ref = _als_solve_side(jnp.asarray(q0), jnp.asarray(pad(user_fb)),
                            block=block, alpha=alpha, reg=reg,
                            other_mask=imask_ref)[:n_users]
    q_ref = _als_solve_side(p_ref, jnp.asarray(pad(item_fb)),
                            block=block, alpha=alpha, reg=reg,
                            other_mask=umask_ref[:n_users])[:n_items]

    mesh = make_mesh(8)
    q, ufb, ifb, umask, imask, _, _ = shard_als_inputs(mesh, q0, user_fb, item_fb, block)
    epoch = make_sharded_als_epoch(mesh, block, alpha, reg)
    p_sh, q_sh = epoch(q, ufb, ifb, umask, imask)

    np.testing.assert_allclose(np.asarray(p_sh)[:n_users], np.asarray(p_ref),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q_sh)[:n_items], np.asarray(q_ref),
                               rtol=2e-4, atol=1e-6)


def test_als_fit_with_mesh():
    """ALS.fit(config.mesh) trains sharded and reaches the same quality as
    the single-device fit on a small synthetic dataset."""
    from gorse_tpu.models import ALS, Params
    from gorse_tpu.models.params import FitConfig
    from gorse_tpu.parallel import make_mesh

    data = synthetic_cf(n_users=120, n_items=60, rank=4, density=0.25, seed=1)
    train, test = data.split_cf(seed=0)
    params = Params(n_factors=8, n_epochs=8, reg=0.015, alpha=0.05)

    single = ALS(params).fit(train, test, FitConfig(verbose=0))
    mesh = make_mesh(8)
    sharded = ALS(params).fit(train, test, FitConfig(verbose=0, mesh=mesh))
    assert abs(sharded.ndcg - single.ndcg) < 0.02, (sharded.ndcg, single.ndcg)
    assert sharded.ndcg > 0.5


def test_afm_fit_with_mesh_matches_single_device():
    """AFM data-parallel fit (batch axis sharded, params replicated, XLA
    psum) must match the single-device fit numerically."""
    from gorse_tpu.data.ctr import synthetic_ctr
    from gorse_tpu.models.fm import AFM
    from gorse_tpu.models.params import FitConfig, Params
    from gorse_tpu.parallel import make_mesh

    data = synthetic_ctr(n_samples=400, n_users=40, n_items=30, seed=0)
    train, test = data.split(0.2, seed=1)
    params = Params(n_factors=8, n_epochs=3, lr=0.01, batch_size=64)

    m1 = AFM(params)
    s1 = m1.fit(train, test, FitConfig(verbose=0))
    mesh = make_mesh(8)
    m8 = AFM(params)
    s8 = m8.fit(train, test, FitConfig(verbose=0, mesh=mesh))

    np.testing.assert_allclose(
        np.asarray(m8.model_params["v"]), np.asarray(m1.model_params["v"]),
        rtol=5e-4, atol=5e-6,
    )
    assert abs(s8.auc - s1.auc) < 5e-3, (s8.auc, s1.auc)


def test_bpr_fit_with_mesh():
    """BPR.fit(config.mesh) trains users-sharded and matches the
    single-device fit quality (sampling is sharding-invariant)."""
    from gorse_tpu.models import BPR, Params
    from gorse_tpu.models.params import FitConfig
    from gorse_tpu.parallel import make_mesh

    data = synthetic_cf(n_users=150, n_items=80, rank=4, density=0.2, seed=2)
    train, test = data.split_cf(seed=0)
    params = Params(n_factors=8, n_epochs=20, lr=0.05, reg=0.01)

    single = BPR(params).fit(train, test, FitConfig(verbose=0))
    sharded = BPR(params).fit(train, test, FitConfig(verbose=0, mesh=make_mesh(8)))
    assert sharded.ndcg > 0.45, sharded.ndcg
    assert abs(sharded.ndcg - single.ndcg) < 0.05, (sharded.ndcg, single.ndcg)



def test_per_user_uniforms_slice_invariant():
    """The counter-based sampler generates only its shard's rows (O(U_local)
    per device, VERDICT r3 missing #2) yet any slice of the user axis —
    contiguous or not — reproduces the corresponding rows of the full
    generation bit-for-bit."""
    import jax.numpy as jnp

    from gorse_tpu.parallel.sharded import _per_user_uniforms

    kd = jnp.array([123, 987654321], dtype=jnp.uint32)
    full = np.asarray(_per_user_uniforms(kd, jnp.arange(256, dtype=jnp.int32), 5))
    part = np.asarray(
        _per_user_uniforms(kd, jnp.arange(64, 192, dtype=jnp.int32), 5)
    )
    assert np.array_equal(full[64:192], part)
    scattered = jnp.asarray(np.array([3, 17, 99, 200], dtype=np.int32))
    assert np.array_equal(
        full[[3, 17, 99, 200]], np.asarray(_per_user_uniforms(kd, scattered, 5))
    )
    # distribution sanity on a larger draw
    big = np.asarray(_per_user_uniforms(kd, jnp.arange(20000, dtype=jnp.int32), 4))
    assert 0.49 < big.mean() < 0.51 and big.std() > 0.27
    assert big.min() >= 0.0 and big.max() < 1.0


def test_threefry_matches_jax_reference():
    """The explicit threefry-2x32 (needed to generate counter SUBSETS) is
    the same cipher jax.random uses — verified word-for-word against jax's
    internal implementation when importable."""
    import jax.numpy as jnp

    from gorse_tpu.parallel.sharded import _threefry2x32

    try:
        from jax._src.prng import threefry_2x32
    except ImportError:
        pytest.skip("jax internal threefry not importable")
    k = jnp.array([0xDEADBEEF, 0x12345678], dtype=jnp.uint32)
    x0 = jnp.arange(33, dtype=jnp.uint32) * np.uint32(2654435761)
    x1 = jnp.arange(33, dtype=jnp.uint32) * np.uint32(97)
    w0, w1 = _threefry2x32(k[0], k[1], x0, x1)
    ref = np.asarray(threefry_2x32(k, jnp.concatenate([x0, x1])))
    assert np.array_equal(ref, np.concatenate([np.asarray(w0), np.asarray(w1)]))


def test_sync_every_variant(setup):
    """sync_every>1 (one item psum per j steps — the documented local-SGD
    staleness variant) is deterministic for a fixed mesh, still learns, and
    sync_every=1 remains bit-identical across shard counts."""
    train, csr, p0, q0 = setup
    mesh = make_mesh(4)
    epoch = make_sharded_bpr_epoch(
        mesh, n_steps=20, n_items=train.count_items(), lr=0.05, reg=0.01,
        sync_every=4,
    )

    def run_epochs(n):
        p, q, pp, pc, uids, n_users = shard_bpr_inputs(
            mesh, p0, q0, csr.padded, csr.counts
        )
        key = jax.random.PRNGKey(0)
        costs = []
        for _ in range(n):
            key, ke = jax.random.split(key)
            p, q, cost = epoch(p, q, pp, pc, uids, ke)
            costs.append(float(cost[0]))
        return np.asarray(p)[:n_users], np.asarray(q), costs

    p_a, q_a, costs_a = run_epochs(10)
    p_b, q_b, costs_b = run_epochs(10)
    assert np.array_equal(p_a, p_b) and np.array_equal(q_a, q_b)  # deterministic
    assert costs_a[-1] < costs_a[0] - 1.0, costs_a  # still learns


def test_sync_every_fused_matches_xla_variant():
    """The FUSED sharded epoch's sync_every>1 path (pcast-varying
    accumulator around the Pallas kernel) must match the XLA sharded epoch
    with the same sync_every — the samplers are identical, so the local-SGD
    trajectories coincide up to FP order."""
    from gorse_tpu.ops.bpr_kernel import pack_items, unpack_items
    from gorse_tpu.parallel.sharded import make_sharded_bpr_epoch_fused

    n_users, n_items, k = 96, 64, 16
    rng = np.random.default_rng(4)
    counts = rng.integers(1, 12, size=n_users).astype(np.int32)
    padded = np.full((n_users, 16), -1, dtype=np.int32)
    for u in range(n_users):
        padded[u, : counts[u]] = rng.choice(n_items, size=counts[u], replace=False)
    p0 = rng.normal(scale=0.01, size=(n_users, k)).astype(np.float32)
    q0 = rng.normal(scale=0.01, size=(n_items, k)).astype(np.float32)
    key = jax.random.PRNGKey(11)
    mesh = make_mesh(4)

    p, q, pp, pc, uids, _ = shard_bpr_inputs(mesh, p0, q0, padded, counts)
    epoch_xla = make_sharded_bpr_epoch(
        mesh, n_steps=6, n_items=n_items, lr=0.05, reg=0.01, sync_every=3
    )
    p_x, q_x, cost_x = epoch_xla(p, q, pp, pc, uids, key)

    p, _, pp, pc, uids, _ = shard_bpr_inputs(mesh, p0, q0, padded, counts)
    qp = jax.device_put(
        pack_items(jnp.asarray(q0)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    epoch_fused = make_sharded_bpr_epoch_fused(
        mesh, n_steps=6, n_items=n_items, lr=0.05, reg=0.01, interpret=True,
        sync_every=3,
    )
    p_f, qp_f, cost_f = epoch_fused(p, qp, pp, pc, uids, key)
    q_f = unpack_items(qp_f, n_items, k)

    np.testing.assert_allclose(np.asarray(cost_f), np.asarray(cost_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_x), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_x), rtol=2e-5, atol=1e-7)


def test_sync_every_accuracy_regression():
    """Staleness cost gate (VERDICT r4 next #5): at a power-law corpus scale
    the bounded-staleness variants must stay within the measured envelope of
    the exact epoch. Full ml-1m-scale numbers (sync4 -0.0023, sync16
    -0.0359 vs 0.6030) live in PARITY.md; this pins the smaller-scale
    shape so a samplng/merge regression can't silently widen the gap."""
    from gorse_tpu.data import synthetic_cf_powerlaw
    from gorse_tpu.models import BPR, Params
    from gorse_tpu.models.params import FitConfig

    mesh = make_mesh(8)
    data = synthetic_cf_powerlaw(n_users=1500, n_items=2000, nnz=150_000, seed=5)
    train, test = data.split_cf(seed=0)
    scores = {}
    for sync in (1, 4, 16):
        model = BPR(Params(n_factors=8, n_epochs=15, lr=0.05, reg=0.01))
        scores[sync] = model.fit(
            train, test, FitConfig(verbose=0, mesh=mesh, sync_every=sync)
        ).ndcg
    assert scores[1] >= 0.50, scores  # corpus sanity (r3/r4 rig level)
    assert scores[4] >= scores[1] - 0.03, scores
    assert scores[16] >= scores[1] - 0.10, scores
