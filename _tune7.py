import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gorse_tpu.data import synthetic_cf
from gorse_tpu.models import BPR, Params
import gorse_tpu.ops.bpr_kernel as bk
LANES = 128

def sample_onecall(pp, pc, block_u, max_len, n_items, n_tries):
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

def make_kernel(sampler, transposed):
    def kern(seed_ref, pp_ref, pc_ref, p_ref, qp_ref,
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
                pos, neg = sampler(pp, count, block_u, max_len, n_items, n_tries)
                p_new, qd, cost = bk._kernel_block_update(
                    pos, neg, (count > 0).astype(jnp.float32), p_out_ref[sl, :], qp_mm, qd, cost,
                    k=k, lr=lr, reg=reg, block_u=block_u, rows_pad=rows_pad,
                    mm_dtype=mm_dtype, transposed_scatter=transposed)
                p_out_ref[sl, :] = p_new
                return qd, cost
            qd0 = jnp.zeros((rows_pad, LANES), jnp.float32)
            qd, cost = jax.lax.fori_loop(0, n_blocks, blk_body, (qd0, cost))
            qp_out_ref[:] = qp_out_ref[:] + qd
            return cost
        cost = jax.lax.fori_loop(0, n_steps, step_body, jnp.float32(0.0))
        cost_ref[0, 0] = cost
    return kern

def make_epoch(kern):
    @functools.partial(jax.jit, static_argnames=("n_steps","n_items","lr","reg","block_u","mm_dtype","n_tries"))
    def epoch(p, q_packed, padded_pos, pos_counts, seed, n_steps, n_items, lr, reg,
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
            functools.partial(kern, k=k, n_items=n_items, lr=lr, reg=reg,
                block_u=block_u, rows_pad=rows_pad, max_len=max_len, mm_dtype=mm_dtype,
                n_tries=n_tries, n_steps=n_steps, n_blocks=u_pad // block_u),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [pl.BlockSpec(memory_space=pltpu.VMEM)]*4,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((u_pad, k), jnp.float32),
                       jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((rows_pad, LANES), jnp.float32)],
        )(jnp.asarray(seed, jnp.int32).reshape(1), pp_arr, pc_arr, p_arr, qp)
    return epoch

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
    try:
        a, b, cost = fn(p0, qp0, pp, pc, seed); _ = float(cost)
    except Exception as e:
        print(f"{label}: FAIL {str(e)[:120]}")
        return
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
timeit(functools.partial(bk.bpr_epoch_fused, **kw),                       "committed                 ")
timeit(functools.partial(make_epoch(make_kernel(bk._kernel_sample_pair, False)), **kw), "dim0-contract scatter     ")
#timeit(functools.partial(make_epoch(make_kernel(sample_onecall, True)), **kw),          "1-call PRNG               ")
timeit(functools.partial(make_epoch(make_kernel(sample_onecall, False)), **kw),         "1-call PRNG + dim0        ")
