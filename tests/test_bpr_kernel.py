"""Fused BPR kernel parity tests (interpret mode on CPU — the QEMU analog)."""

import numpy as np
import jax
import jax.numpy as jnp

from gorse_tpu.ops.bpr_kernel import bpr_fused_step, pack_items, unpack_items


def _xla_reference(p, q, pos, neg, active, lr, reg):
    act = active.astype(np.float32)[:, None]
    qi, qj = q[pos], q[neg]
    diff = np.sum(p * (qi - qj), axis=-1, keepdims=True)
    cost = float(np.sum(act * np.logaddexp(0.0, -diff)))
    grad = act / (1.0 + np.exp(diff))
    d_qi = act * (lr * (grad * p - reg * qi))
    d_qj = act * (lr * (-grad * p - reg * qj))
    d_pu = act * (lr * (grad * (qi - qj) - reg * p))
    q_delta = np.zeros_like(q)
    np.add.at(q_delta, pos, d_qi)
    np.add.at(q_delta, neg, d_qj)
    return p + d_pu, q_delta, cost


def _check(u, n_items, k, seed):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(u, k)).astype(np.float32)
    q = rng.normal(size=(n_items, k)).astype(np.float32)
    pos = rng.integers(0, n_items, size=u).astype(np.int32)
    neg = rng.integers(0, n_items, size=u).astype(np.int32)
    active = (rng.uniform(size=u) > 0.1)
    lr, reg = 0.05, 0.01
    qp = pack_items(jnp.asarray(q))
    p_new, q_delta_packed, cost = bpr_fused_step(
        jnp.asarray(p), qp, jnp.asarray(pos), jnp.asarray(neg),
        jnp.asarray(active), lr, reg, block_u=64, interpret=True,
    )
    q_delta = unpack_items(q_delta_packed, n_items, k)
    ref_p, ref_qd, ref_cost = _xla_reference(p, q, pos, neg, active, lr, reg)
    np.testing.assert_allclose(np.asarray(p_new), ref_p, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q_delta), ref_qd, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(cost), ref_cost, rtol=1e-5)


def test_fused_step_k16():
    _check(u=200, n_items=300, k=16, seed=0)


def test_fused_step_k32():
    _check(u=100, n_items=150, k=32, seed=1)


def test_fused_step_k128():
    _check(u=70, n_items=90, k=128, seed=2)


def test_fused_step_unaligned_sizes():
    _check(u=130, n_items=77, k=16, seed=3)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(4)
    q = rng.normal(size=(37, 16)).astype(np.float32)
    packed = pack_items(jnp.asarray(q))
    assert packed.shape[1] == 128
    back = unpack_items(packed, 37, 16)
    np.testing.assert_array_equal(np.asarray(back), q)
