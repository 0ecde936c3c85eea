"""True multi-process distributed training test.

The reference tests multi-node behavior by embedding a real gRPC master in
process (worker/worker_test.go:571-640); the distributed-TRAINING analog here
is two actual OS processes joined by ``jax.distributed`` (Gloo over
localhost), each contributing 2 virtual CPU devices to one 4-device global
mesh, running the sharded BPR epoch. Counter-based sampling makes the result
bit-identical to a single-process 4-device mesh, which is asserted.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

CHILD = """
import json, sys
import os
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from gorse_tpu.parallel.multihost import init_multihost

init_multihost(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)

import numpy as np
import jax.numpy as jnp
from gorse_tpu.data import synthetic_cf
from gorse_tpu.parallel.mesh import make_mesh
from gorse_tpu.parallel.sharded import make_sharded_bpr_epoch, shard_bpr_inputs

assert len(jax.devices()) == 4, jax.devices()
data = synthetic_cf(n_users=93, n_items=70, rank=4, density=0.15, seed=3)
train, _ = data.split_cf(seed=0)
csr = train.padded_user_positives()
rng = np.random.default_rng(0)
p0 = rng.normal(scale=0.01, size=(train.count_users(), 8)).astype(np.float32)
q0 = rng.normal(scale=0.01, size=(train.count_items(), 8)).astype(np.float32)

mesh = make_mesh(4)
epoch = make_sharded_bpr_epoch(
    mesh, n_steps=5, n_items=train.count_items(), lr=0.05, reg=0.01
)
p, q, pp, pc, uids, n_users = shard_bpr_inputs(mesh, p0, q0, csr.padded, csr.counts)
p, q, cost = epoch(p, q, pp, pc, uids, jax.random.PRNGKey(7))

# catalog-sharded epoch over the same corpus: the item table is row-sharded
# ACROSS THE TWO PROCESSES and rows move via all_to_all over the
# jax.distributed backend — the cross-host §2.7 claim, exercised literally
from gorse_tpu.parallel.catalog import (
    make_catalog_sharded_bpr_epoch, shard_catalog_bpr_inputs,
)

cat = make_catalog_sharded_bpr_epoch(
    mesh, n_steps=5, n_items=train.count_items(), lr=0.05, reg=0.01,
    slack=16.0,
)
p_c, q_c, pp_c, pc_c, uid_c, _, _ = shard_catalog_bpr_inputs(
    mesh, p0, q0, csr.padded, csr.counts
)
p_c, q_c, stats = cat(p_c, q_c, pp_c, pc_c, uid_c, jax.random.PRNGKey(7))
stats = np.asarray(stats)  # replicated -> addressable everywhere
cat_q_sum = float(jnp.sum(q_c))  # global reduction over the sharded table

# q is replicated (P()) and cost is psum'd -> addressable on every process
print("RESULT " + json.dumps({
    "cost": float(np.asarray(cost)[0]),
    "q_sum": float(np.asarray(q).sum()),
    "q_head": np.asarray(q)[0, :4].tolist(),
    "cat_cost": float(stats[0]),
    "cat_dropped": float(stats[1]),
    "cat_q_sum": cat_q_sum,
}), flush=True)
"""


def test_two_process_sharded_epoch(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    repo = str(Path(__file__).resolve().parent.parent)
    env = {"PYTHONPATH": repo, "PATH": "/usr/bin:/bin"}
    import os

    env.update({k: v for k, v in os.environ.items() if k not in env and k != "JAX_PLATFORMS"})
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=280)[0].decode() for p in procs]
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"child produced no result:\n{out[-2000:]}"
        results.append(json.loads(lines[0][len("RESULT "):]))

    # both processes observe the identical replicated model
    assert results[0] == results[1]

    # and it matches a single-process 4-device mesh bit for bit
    # (sharding-invariant counter-based sampling)
    import jax

    from gorse_tpu.data import synthetic_cf
    from gorse_tpu.parallel.mesh import make_mesh
    from gorse_tpu.parallel.sharded import make_sharded_bpr_epoch, shard_bpr_inputs

    data = synthetic_cf(n_users=93, n_items=70, rank=4, density=0.15, seed=3)
    train, _ = data.split_cf(seed=0)
    csr = train.padded_user_positives()
    rng = np.random.default_rng(0)
    p0 = rng.normal(scale=0.01, size=(train.count_users(), 8)).astype(np.float32)
    q0 = rng.normal(scale=0.01, size=(train.count_items(), 8)).astype(np.float32)
    mesh = make_mesh(4, devices=jax.devices()[:4])
    epoch = make_sharded_bpr_epoch(
        mesh, n_steps=5, n_items=train.count_items(), lr=0.05, reg=0.01
    )
    p, q, pp, pc, uids, _ = shard_bpr_inputs(mesh, p0, q0, csr.padded, csr.counts)
    p, q, cost = epoch(p, q, pp, pc, uids, jax.random.PRNGKey(7))
    assert float(np.asarray(cost)[0]) == pytest.approx(results[0]["cost"], rel=1e-6)
    assert float(np.asarray(q).sum()) == pytest.approx(results[0]["q_sum"], rel=1e-6)

    # catalog-sharded cross-process run: no drops, same sampling as the
    # replicated epoch (costs agree to FP tolerance), and it matches a
    # single-process 4-device catalog run
    assert results[0]["cat_dropped"] == 0.0
    assert results[0]["cat_cost"] == pytest.approx(results[0]["cost"], rel=1e-4)
    from gorse_tpu.parallel.catalog import (
        make_catalog_sharded_bpr_epoch,
        shard_catalog_bpr_inputs,
    )

    cat = make_catalog_sharded_bpr_epoch(
        mesh, n_steps=5, n_items=train.count_items(), lr=0.05, reg=0.01,
        slack=16.0,
    )
    p_c, q_c, pp_c, pc_c, uid_c, _, _ = shard_catalog_bpr_inputs(
        mesh, p0, q0, csr.padded, csr.counts
    )
    import jax.numpy as jnp

    p_c, q_c, stats = cat(p_c, q_c, pp_c, pc_c, uid_c, jax.random.PRNGKey(7))
    assert float(np.asarray(stats)[0]) == pytest.approx(
        results[0]["cat_cost"], rel=1e-6
    )
    assert float(jnp.sum(q_c)) == pytest.approx(results[0]["cat_q_sum"], rel=1e-5)
