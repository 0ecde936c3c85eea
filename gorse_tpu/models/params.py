"""Typed hyper-parameter map (reference: model/params.go).

The reference keys hyper-parameters by name with typed getters; model search
merges param grids. Same surface here, as a thin dict subclass.
"""

from __future__ import annotations

# Canonical parameter names (reference: model/params.go)
N_FACTORS = "n_factors"
N_EPOCHS = "n_epochs"
LR = "lr"
REG = "reg"
INIT_MEAN = "init_mean"
INIT_STDDEV = "init_stddev"
ALPHA = "alpha"
BATCH_SIZE = "batch_size"
OPTIMIZER = "optimizer"
AUTO_SCALE = "auto_scale"

SGD = "sgd"
ADAM = "adam"


class Params(dict):
    """Hyper-parameter map with typed getters and merge (model/params.go)."""

    def get_int(self, name: str, default: int) -> int:
        return int(self.get(name, default))

    def get_float(self, name: str, default: float) -> float:
        return float(self.get(name, default))

    def get_bool(self, name: str, default: bool) -> bool:
        return bool(self.get(name, default))

    def get_string(self, name: str, default: str) -> str:
        return str(self.get(name, default))

    def merged(self, overrides: "Params | dict") -> "Params":
        out = Params(self)
        out.update(overrides)
        return out


class FitConfig:
    """Training-loop knobs (reference: model/cf/model.go:51-96 FitConfig)."""

    def __init__(
        self,
        verbose: int = 10,
        patience: int = 0,
        top_k: int = 10,
        candidates: int = 100,
        batch_size: int = 1024,
        seed: int = 0,
        checkpoint_dir: str | None = None,
        mesh=None,
        shard_table: bool = False,
        sync_every: int = 1,
    ) -> None:
        self.verbose = verbose
        self.patience = patience
        self.top_k = top_k
        self.candidates = candidates
        self.batch_size = batch_size
        self.seed = seed
        # mid-training checkpoints every `verbose` epochs (the reference only
        # persists final artifacts; long TPU fits warrant periodic saves)
        self.checkpoint_dir = checkpoint_dir
        # optional jax.sharding.Mesh: train sharded over all its devices
        # (users sharded for BPR/eALS, batch sharded for AFM) — the
        # distributed-training axis the reference lacks (SURVEY.md §2.7)
        self.mesh = mesh
        # with a mesh: ALSO row-shard the AFM feature table across devices
        # (a2a gathers per batch, parallel/catalog.py) instead of
        # replicating it — for feature spaces too large per device
        self.shard_table = shard_table
        # with a mesh: combine sharded-BPR item updates across devices every
        # N steps instead of every step (local-SGD bounded staleness — cuts
        # collective volume N×; accuracy cost measured in PARITY.md)
        self.sync_every = sync_every

    def __repr__(self) -> str:
        return (
            f"FitConfig(verbose={self.verbose}, patience={self.patience}, "
            f"top_k={self.top_k}, candidates={self.candidates}, "
            f"batch_size={self.batch_size}, seed={self.seed})"
        )
