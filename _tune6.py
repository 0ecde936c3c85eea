import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gorse_tpu.data import synthetic_cf
from gorse_tpu.models import BPR, Params
import gorse_tpu.ops.bpr_kernel as bk
LANES = 128

def sample_pair_onecall(pp, pc, block_u, max_len, n_items, n_tries):
    """All PRNG bits for the block in ONE prng_random_bits call."""
    bits = pltpu.bitcast(pltpu.prng_random_bits((block_u, 1 + n_tries)), jnp.uint32)
    slot = (bits[:, :1] % jnp.maximum(pc, 1).astype(jnp.uint32)).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_u, max_len), 1)
    pos = jnp.maximum(jnp.sum(jnp.where(lane == slot, pp, 0), axis=1, keepdims=True), 0)
    neg = jnp.zeros((block_u, 1), jnp.int32)
    first = jnp.zeros((block_u, 1), jnp.int32)
    ok = jnp.zeros((block_u, 1), jnp.bool_)
    for t in range(n_tries):
        c = (bits[:, 1 + t:2 + t] % jnp.uint32(n_items)).astype(jnp.int32)
        if t == 0:
            first = c
        collides = jnp.any(pp == c, axis=1, keepdims=True)
        take = jnp.logical_and(jnp.logical_not(ok), jnp.logical_not(collides))
        neg = jnp.where(take, c, neg)
        ok = jnp.logical_or(ok, jnp.logical_not(collides))
    return pos, jnp.where(ok, neg, first)

def block_update_v4(pos, neg, active, p, qp_mm, qd, cost, *, k, lr, reg, block_u, rows_pad, mm_dtype):
    """Lane-dense + merged matmuls + dim0-contract scatter (reuses gather one-hots)."""
    pack = LANES // k
    # merged one-hot build: [2TB, R] for pos rows then neg rows
    both = jnp.concatenate([pos, neg], axis=0)  # [2TB,1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (2 * block_u, rows_pad), 1)
    oh = (row_ids == both // pack).astype(mm_dtype)  # [2TB, R]
    g = jnp.dot(oh, qp_mm, preferred_element_type=jnp.float32)  # [2TB, 128]
    group = jax.lax.broadcasted_iota(jnp.int32, (2 * block_u, LANES), 1) // k
    gmask = group == both % pack
    g_big = g * gmask  # [2TB,128] masked
    qi_big = g_big[:block_u]
    qj_big = g_big[block_u:]
    p8 = jnp.concatenate([p] * pack, axis=1)
    diff = (jnp.sum(p8 * qi_big, axis=-1, keepdims=True)
            - jnp.sum(p8 * qj_big, axis=-1, keepdims=True))
    cost = cost + jnp.sum(active * jnp.logaddexp(0.0, -diff))
    grad = active * jax.nn.sigmoid(-diff)
    dp = jnp.concatenate([grad * p8, -grad * p8], axis=0) - reg * g_big
    dp = (jnp.concatenate([active, active], axis=0) * lr * dp) * gmask  # [2TB,128]
    d_big = qi_big - qj_big
    fold = d_big[:, :k]
    for gg in range(1, pack):
        fold = fold + d_big[:, gg * k:(gg + 1) * k]
    d_pu = active * (lr * (grad * fold - reg * p))
    qd = qd + jax.lax.dot_general(
        oh, dp.astype(mm_dtype), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return p + d_pu, qd, cost

def resident_kernel_v4(seed_ref, pp_ref, pc_ref, p_ref, qp_ref,
    p_out_ref, qp_out_ref, cost_ref, qd_scratch,
    *, k, n_items, lr, reg, block_u, rows_pad, max_len, mm_dtype, n_tries, n_steps, n_blocks):
    pltpu.prng_seed(seed_ref[0])
    p_out_ref[:] = p_ref[:]
    qp_out_ref[:] = qp_ref[:]
    def step_body(_s, cost):
        qp_mm = qp_out_ref[:].astype(mm_dtype)
        def blk_body(b, carry):
            qd, cost = carry
            sl = pl.ds(b * block_u, block_u)
            pp = pp_ref[sl, :]
            count = pc_ref[sl, :]
            pos, neg = sample_pair_onecall(pp, count, block_u, max_len, n_items, n_tries)
            p_new, qd, cost = block_update_v4(
                pos, neg, (count > 0).astype(jnp.float32), p_out_ref[sl, :], qp_mm, qd, cost,
                k=k, lr=lr, reg=reg, block_u=block_u, rows_pad=rows_pad, mm_dtype=mm_dtype)
            p_out_ref[sl, :] = p_new
            return qd, cost
        qd0 = jnp.zeros((rows_pad, LANES), jnp.float32)
        qd, cost = jax.lax.fori_loop(0, n_blocks, blk_body, (qd0, cost))
        qp_out_ref[:] = qp_out_ref[:] + qd
        return cost
    cost = jax.lax.fori_loop(0, n_steps, step_body, jnp.float32(0.0))
    cost_ref[0, 0] = cost

@functools.partial(jax.jit, static_argnames=("n_steps","n_items","lr","reg","block_u","mm_dtype","n_tries"))
def epoch_v4(p, q_packed, padded_pos, pos_counts, seed, n_steps, n_items, lr, reg,
             block_u=512, mm_dtype=jnp.bfloat16, n_tries=4):
    n_users, k = p.shape
    max_len = bk._round_up(padded_pos.shape[1], LANES)
    rows = q_packed.shape[0]
    rows_pad = bk._round_up(rows, 8)
    u_pad = bk._round_up(n_users, block_u)
    qp = jnp.zeros((rows_pad, LANES), jnp.float32).at[:rows].set(q_packed)
    pp_arr = jnp.full((u_pad, max_len), -1, jnp.int32).at[:n_users, :padded_pos.shape[1]].set(padded_pos)
    pc_arr = jnp.zeros((u_pad, 1), jnp.int32).at[:n_users, 0].set(pos_counts)
    p_arr = jnp.zeros((u_pad, k), jnp.float32).at[:n_users].set(p)
    return pl.pallas_call(
        functools.partial(resident_kernel_v4, k=k, n_items=n_items, lr=lr, reg=reg,
            block_u=block_u, rows_pad=rows_pad, max_len=max_len, mm_dtype=mm_dtype,
            n_tries=n_tries, n_steps=n_steps, n_blocks=u_pad // block_u),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [pl.BlockSpec(memory_space=pltpu.VMEM)]*4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((u_pad, k), jnp.float32),
                   jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((rows_pad, LANES), jnp.float32)],
    )(jnp.asarray(seed, jnp.int32).reshape(1), pp_arr, pc_arr, p_arr, qp)

data = synthetic_cf(n_users=6040, n_items=3706, rank=16, density=0.045, seed=0)
train, _ = data.split_cf(seed=0)
nnz = train.count_feedback()
model = BPR(Params(n_factors=16)); model.init(train)
csr = train.padded_user_positives()
pp = jnp.asarray(csr.padded); pc = jnp.asarray(csr.counts)
n_active = max(int(np.sum(csr.counts > 0)), 1)
n_steps = max(round(nnz / n_active), 1)
qp0 = bk.pack_items(model.item_factors); p0 = model.user_factors

def timeit(fn, label):
    seed = jnp.asarray([42], jnp.int32)
    out = fn(p0, qp0, pp, pc, seed); _ = float(out[2] if isinstance(out, tuple) else out[2])
    def run(n):
        a, b = p0, qp0
        t0 = time.perf_counter()
        for i in range(n):
            a, b, cost = fn(a, b, pp, pc, seed + i)
        _ = float(cost)
        return time.perf_counter() - t0
    run(4); run(12)
    d1 = min(run(4) for _ in range(3)); d2 = min(run(12) for _ in range(3))
    ex = 8 * n_steps * n_active / (d2 - d1)
    print(f"{label}: {(d2-d1)/8*1e3:7.2f} ms/epoch  {ex/1e6:8.1f} M ex/s")

kw = dict(n_steps=n_steps, n_items=3706, lr=0.05, reg=0.01, n_tries=3)
timeit(functools.partial(bk.bpr_epoch_fused, **kw), "lane-dense (committed)")
timeit(functools.partial(epoch_v4, **kw),           "v4 merged+dim0+1prng ")
# quality check: NDCG shouldn't regress (different PRNG layout changes stream)
pa, qa, ca = epoch_v4(p0, qp0, pp, pc, jnp.asarray([7], jnp.int32), **kw)
print("v4 cost finite:", np.isfinite(float(ca)), float(ca))
