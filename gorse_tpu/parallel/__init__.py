from .mesh import make_mesh, mf_shardings
from .ratelimit import RateLimiters, TokenBucket
from .sharded import (
    make_sharded_bpr_epoch,
    make_sharded_bpr_epoch_fused,
    make_sharded_topk,
    shard_bpr_inputs,
)

__all__ = [
    "make_mesh",
    "mf_shardings",
    "RateLimiters",
    "TokenBucket",
    "make_sharded_bpr_epoch",
    "make_sharded_bpr_epoch_fused",
    "make_sharded_topk",
    "shard_bpr_inputs",
]
