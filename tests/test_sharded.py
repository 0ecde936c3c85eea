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
