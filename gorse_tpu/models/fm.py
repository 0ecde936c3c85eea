"""AFM — factorization machine with attention-encoded embedding features.

Covers the reference's model/ctr/fm.go (pure-Go autograd build) and
fm_xla.go (the gomlx/XLA build, whose DotGeneral graph — fm_xla.go:152-211 —
is the closest reference spec for this TPU tower). Forward math, per sample
with sparse features (idx, x) and optional dense embedding columns e_c:

    vx  = sum_d  x_d * V[idx_d]                       # [k]
    fm  = w.x + 0.5 * sum_k(vx^2 - sum_d V[idx_d]^2 x_d^2) + b
    out = fm + sum_c  vx . E_c( A_c(e_c) )            # attention towers

where A_c(e) = softmax(relu(e Wc + bc) Hc, axis=-1) * e (common/nn/layers.go
Attention :160-190) and E_c is a Linear(dim->k).

TPU-native differences from the reference:
- whole training epoch is one jitted ``lax.scan`` over fixed-shape batches
  (the reference loops Go slices batch-by-batch);
- targets are normalized to {0,1} at load; standard mean BCE-with-logits
  (the reference feeds ±1 targets through y=(t+1)/2 — same loss);
- optimizer is optax: adam/sgd with L2-into-gradient weight decay, matching
  the reference's Adam.Step (common/nn/optimizers.go:118-156 applies
  grad += wd*param before the moment updates).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.ctr import CTRDataset
from ..ops.metrics import classification_metrics
from .params import (
    ADAM,
    AUTO_SCALE,
    BATCH_SIZE,
    INIT_MEAN,
    INIT_STDDEV,
    LR,
    N_EPOCHS,
    N_FACTORS,
    OPTIMIZER,
    REG,
    FitConfig,
    Params,
)
from .scaler import AutoScaler, apply_scalers, fit_auto_scalers

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class CTRScore:
    """Classification fit result (reference: model/ctr/model.go Score)."""

    auc: float
    accuracy: float
    precision: float
    recall: float

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def afm_forward_rows(params: dict, v: jax.Array, w: jax.Array, values: jax.Array,
                     embeddings: list[jax.Array]):
    """AFM forward from pre-gathered factor rows: ``v`` [B, D, k], ``w``
    [B, D, 1] — the math shared by the replicated path (rows =
    ``params["v"][indices]``) and the sharded-table path (rows arrive via
    cross-device all-to-all gathers, parallel/catalog.py). ``params`` here
    supplies only the replicated leaves (``b``, ``att``)."""
    x = values[..., None]  # [B, D, 1]
    vx = jnp.sum(v * x, axis=1)  # [B, k]
    sum_square = vx * vx
    square_sum = jnp.sum((v * v) * (x * x), axis=1)  # [B, k]
    interaction = 0.5 * jnp.sum(sum_square - square_sum, axis=1)  # [B]
    linear = jnp.sum(w[..., 0] * values, axis=1)  # [B]
    out = linear + interaction + params["b"]
    for c, e in enumerate(embeddings):
        att = params["att"][c]
        scores = jax.nn.relu(e @ att["w"] + att["wb"]) @ att["h"]  # [B, dim]
        attended = jax.nn.softmax(scores, axis=-1) * e  # [B, dim]
        enc = attended @ att["ew"] + att["eb"]  # [B, k]
        out = out + jnp.sum(vx * enc, axis=1)
    return out


def afm_forward(params: dict, indices: jax.Array, values: jax.Array, embeddings: list[jax.Array]):
    """AFM forward pass. indices/values: [B, D]; embeddings: list of [B, dim]."""
    return afm_forward_rows(
        params, params["v"][indices], params["w"][indices], values, embeddings
    )


@functools.lru_cache(maxsize=64)
def _cached_optimizer(name: str, lr: float, reg: float):
    decay = optax.add_decayed_weights(reg)
    if name == ADAM:
        return optax.chain(decay, optax.scale_by_adam(), optax.scale(-lr))
    return optax.chain(decay, optax.scale(-lr))


def _bce_with_logits(logits, targets, sample_weight):
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(loss * sample_weight) / jnp.maximum(jnp.sum(sample_weight), 1.0)


@functools.partial(jax.jit, static_argnames=("optimizer",), donate_argnums=(0, 1))
def _afm_train_epoch(
    params: dict,
    opt_state,
    batched_indices: jax.Array,  # [S, B, D]
    batched_values: jax.Array,  # [S, B, D]
    batched_targets: jax.Array,  # [S, B]
    batched_weights: jax.Array,  # [S, B] 0 on padding rows
    batched_embeddings: tuple,  # per column: [S, B, dim]
    optimizer,
):
    tx = optimizer

    def step(carry, batch):
        params, opt_state = carry
        idx, val, tgt, wgt, embs = batch

        def loss_fn(p):
            logits = afm_forward(p, idx, val, list(embs))
            return _bce_with_logits(logits, tgt, wgt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        step,
        (params, opt_state),
        (batched_indices, batched_values, batched_targets, batched_weights, batched_embeddings),
    )
    return params, opt_state, jnp.sum(losses)


class AFM:
    """Attention factorization machine (reference: model/ctr/fm.go:60-413)."""

    name = "afm"

    def __init__(self, params: Params | dict | None = None) -> None:
        self.params = Params(params or {})
        p = self.params
        self.n_factors = p.get_int(N_FACTORS, 16)
        self.n_epochs = p.get_int(N_EPOCHS, 50)
        self.lr = p.get_float(LR, 0.001)
        self.reg = p.get_float(REG, 0.0002)
        self.init_mean = p.get_float(INIT_MEAN, 0.0)
        self.init_stddev = p.get_float(INIT_STDDEV, 0.01)
        self.optimizer_name = p.get_string(OPTIMIZER, ADAM)
        self.batch_size = p.get_int(BATCH_SIZE, 1024)
        self.auto_scale = p.get_bool(AUTO_SCALE, True)
        self.model_params: dict | None = None
        self.index = None
        self.scalers: dict[int, AutoScaler] = {}
        self.embedding_dims: list[int] = []
        self.num_dimension = 0

    def is_fitted(self) -> bool:
        return self.model_params is not None

    def _init_params(self, n_features: int, embedding_dims: list[int], seed: int) -> dict:
        key = jax.random.PRNGKey(seed)
        kv, kw, *katt = jax.random.split(key, 2 + 3 * max(len(embedding_dims), 1))
        params = {
            "b": jnp.zeros((), jnp.float32),
            "v": self.init_mean
            + self.init_stddev * jax.random.normal(kv, (n_features, self.n_factors)),
            "w": self.init_mean
            + self.init_stddev * jax.random.normal(kw, (n_features, 1)),
            "att": [],
        }
        for c, dim in enumerate(embedding_dims):
            k1, k2, k3 = katt[3 * c : 3 * c + 3]
            # Linear layers init like the reference nn.NewLinear (normal 0.01);
            # H like nn.NewAttention (normal 0.01)
            params["att"].append(
                {
                    "w": 0.01 * jax.random.normal(k1, (dim, self.n_factors)),
                    "wb": jnp.zeros((self.n_factors,), jnp.float32),
                    "h": 0.01 * jax.random.normal(k2, (self.n_factors, dim)),
                    "ew": 0.01 * jax.random.normal(k3, (dim, self.n_factors)),
                    "eb": jnp.zeros((self.n_factors,), jnp.float32),
                }
            )
        return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    def _make_optimizer(self):
        # memoized on hyperparameters: the GradientTransformation is a jit
        # STATIC argument of _afm_train_epoch (hashed by object identity), so
        # a fresh chain per fit() would recompile the whole scan epoch on
        # every periodic refit / search trial and grow the jit cache forever
        return _cached_optimizer(self.optimizer_name, self.lr, self.reg)

    def _batch(self, padded, batch_size):
        """Reshape padded arrays into [S, B, ...] with a zero-weight tail."""
        n = padded.indices.shape[0]
        s = max((n + batch_size - 1) // batch_size, 1)
        pad = s * batch_size - n

        def pad_rows(x):
            if pad == 0:
                return x
            return np.concatenate([x, np.zeros((pad,) + x.shape[1:], dtype=x.dtype)], axis=0)

        weights = pad_rows(np.ones(n, dtype=np.float32))
        return (
            jnp.asarray(pad_rows(padded.indices)).reshape(s, batch_size, -1),
            jnp.asarray(pad_rows(padded.values)).reshape(s, batch_size, -1),
            jnp.asarray(pad_rows(padded.targets)).reshape(s, batch_size),
            jnp.asarray(weights).reshape(s, batch_size),
            tuple(
                jnp.asarray(pad_rows(e)).reshape(s, batch_size, -1) for e in padded.embeddings
            ),
        )

    def fit(self, train: CTRDataset, test: CTRDataset, config: FitConfig | None = None) -> CTRScore:
        config = config or FitConfig(verbose=1)
        self.index = train.index
        self.embedding_dims = list(train.embedding_dims)
        self.num_dimension = max(train.max_dimension(), test.max_dimension())
        n_features = train.num_features()
        if self.auto_scale:
            self.scalers = fit_auto_scalers(train.features)
        self.model_params = self._init_params(n_features, self.embedding_dims, config.seed)

        train_pad = train.padded(self.num_dimension)
        test_pad = test.padded(self.num_dimension)
        if self.scalers:
            train_pad.values = apply_scalers(
                train_pad.indices, train_pad.values, self.scalers, train_pad.valid
            )
            test_pad.values = apply_scalers(
                test_pad.indices, test_pad.values, self.scalers, test_pad.valid
            )
        mesh = getattr(config, "mesh", None)
        batch_size = self.batch_size
        if mesh is not None and mesh.size > 1:
            # data-parallel epoch: batch axis sharded over the mesh, params
            # replicated, gradient psum inserted by XLA (parallel/sharded.py)
            batch_size = -(-batch_size // mesh.size) * mesh.size
        batches = self._batch(train_pad, batch_size)

        tx = self._make_optimizer()
        score = self._evaluate(test_pad)  # epoch-0 eval on the dense init
        shard_table = (
            mesh is not None and mesh.size > 1
            and getattr(config, "shard_table", False)
        )
        to_dense = lambda p: p  # noqa: E731 — identity for the dense paths
        if shard_table:
            # feature table row-sharded over the mesh with per-batch a2a
            # gathers (SURVEY §7 hard-part #4); math matches the replicated
            # DP epoch — see parallel/catalog.make_sharded_afm_epoch
            from ..parallel.catalog import (
                make_sharded_afm_epoch,
                shard_afm_params,
                unshard_afm_params,
            )
            from ..parallel.sharded import shard_afm_batches

            batches = shard_afm_batches(mesh, batches)
            self.model_params = shard_afm_params(mesh, self.model_params)
            opt_state = tx.init(self.model_params)
            raw_epoch = make_sharded_afm_epoch(mesh, tx)
            self.table_drop_count = None  # routing-cap overflows last epoch

            def epoch_fn(params, opt_state, *b, _raw=raw_epoch):
                params, opt_state, cost, dropped = _raw(params, opt_state, *b)
                self.table_drop_count = dropped
                return params, opt_state, cost

            to_dense = functools.partial(
                unshard_afm_params, mesh, n_features=n_features,
                n_factors=self.n_factors,
            )
        else:
            opt_state = tx.init(self.model_params)
            if mesh is not None and mesh.size > 1:
                from ..parallel.sharded import replicate, shard_afm_batches

                batches = shard_afm_batches(mesh, batches)
                self.model_params = replicate(mesh, self.model_params)
                opt_state = replicate(mesh, opt_state)
            epoch_fn = functools.partial(_afm_train_epoch, optimizer=tx)

        history = [(0, score.auc)]
        logger.info("fit afm 0/%d AUC=%.4f", self.n_epochs, score.auc)
        params = self.model_params
        for epoch in range(1, self.n_epochs + 1):
            t0 = time.time()
            params, opt_state, cost = epoch_fn(params, opt_state, *batches)
            if (config.verbose and epoch % config.verbose == 0) or epoch == self.n_epochs:
                self.model_params = to_dense(params)
                score = self._evaluate(test_pad)
                history.append((epoch, score.auc))
                logger.info(
                    "fit afm %d/%d fit=%.2fs loss=%.4f AUC=%.4f Acc=%.4f",
                    epoch, self.n_epochs, time.time() - t0, float(cost), score.auc, score.accuracy,
                )
                if not np.isfinite(float(cost)) or not np.isfinite(score.auc):
                    logger.warning("model diverged (lr=%g)", self.lr)
                    break
                if config.patience > 0 and epoch > config.patience:
                    best_epoch = max(history, key=lambda t: t[1])[0]
                    if best_epoch <= epoch - config.patience:
                        logger.info("early stopping at epoch %d (best %d)", epoch, best_epoch)
                        break
        self.model_params = to_dense(params)
        return self._evaluate(test_pad)

    def _evaluate(self, test_pad) -> CTRScore:
        logits = self.predict_padded(test_pad.indices, test_pad.values, test_pad.embeddings)
        m = classification_metrics(jnp.asarray(test_pad.targets), logits)
        return CTRScore(
            auc=float(m["AUC"]),
            accuracy=float(m["Accuracy"]),
            precision=float(m["Precision"]),
            recall=float(m["Recall"]),
        )

    # inference chunk: bounds the [chunk, D, k] gather the forward pass
    # materializes — one giant batch would OOM on criteo-scale test sets
    # (reference: BatchInternalPredict slices by fm.batchSize, fm.go:155-177)
    PREDICT_CHUNK = 65536

    def predict_padded(self, indices, values, embeddings=()) -> jax.Array:
        """Batched inference on padded arrays (reference: BatchInternalPredict
        model/ctr/fm.go:155-177). Scalers are applied by callers on raw input."""
        n = len(indices)
        if n <= self.PREDICT_CHUNK:
            return _afm_predict(
                self.model_params, jnp.asarray(indices), jnp.asarray(values),
                tuple(jnp.asarray(e) for e in embeddings),
            )
        outs = []
        for lo in range(0, n, self.PREDICT_CHUNK):
            hi = lo + self.PREDICT_CHUNK
            outs.append(
                _afm_predict(
                    self.model_params,
                    jnp.asarray(indices[lo:hi]), jnp.asarray(values[lo:hi]),
                    tuple(jnp.asarray(e[lo:hi]) for e in embeddings),
                )
            )
        return jnp.concatenate(outs)

    def batch_predict(self, rows: list[tuple[list[int], list[float]]], embeddings=None) -> np.ndarray:
        """Predict from sparse rows, applying scalers (model/ctr/fm.go:155-225)."""
        n = len(rows)
        d = self.num_dimension
        indices = np.zeros((n, d), dtype=np.int32)
        values = np.zeros((n, d), dtype=np.float32)
        valid = np.zeros((n, d), dtype=bool)
        for i, (idx, val) in enumerate(rows):
            m = min(len(idx), d)
            indices[i, :m] = idx[:m]
            values[i, :m] = val[:m]
            valid[i, :m] = True
        if self.auto_scale and self.scalers:
            values = apply_scalers(indices, values, self.scalers, valid)
        embs = [np.zeros((n, dim), dtype=np.float32) for dim in self.embedding_dims]
        if embeddings is not None:
            for c in range(len(self.embedding_dims)):
                for i in range(n):
                    if embeddings[i][c] is not None:
                        embs[c][i] = embeddings[i][c]
        return np.asarray(self.predict_padded(indices, values, embs))

    # ------------------------------------------------------------- serialize

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        flat = {
            "b": np.asarray(self.model_params["b"]),
            "v": np.asarray(self.model_params["v"]),
            "w": np.asarray(self.model_params["w"]),
        }
        for c, att in enumerate(self.model_params["att"]):
            for k, arr in att.items():
                flat[f"att{c}_{k}"] = np.asarray(arr)
        np.savez(path / "params.npz", **flat)
        meta = {
            "name": self.name,
            "params": dict(self.params),
            "num_dimension": self.num_dimension,
            "embedding_dims": self.embedding_dims,
            "scalers": {str(k): s.to_dict() for k, s in self.scalers.items()},
            "index": self.index.to_dict() if self.index is not None else None,
        }
        (path / "meta.json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, path: str | Path) -> "AFM":
        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        model = cls(Params(meta["params"]))
        model.num_dimension = meta["num_dimension"]
        model.embedding_dims = meta["embedding_dims"]
        model.scalers = {int(k): AutoScaler.from_dict(d) for k, d in meta["scalers"].items()}
        if meta["index"] is not None:
            from ..data.unified_index import DirectIndex, UnifiedIndex

            if "direct" in meta["index"]:
                model.index = DirectIndex.from_dict(meta["index"])
            else:
                model.index = UnifiedIndex.from_dict(meta["index"])
        arrays = np.load(path / "params.npz")
        params = {
            "b": jnp.asarray(arrays["b"]),
            "v": jnp.asarray(arrays["v"]),
            "w": jnp.asarray(arrays["w"]),
            "att": [],
        }
        c = 0
        while f"att{c}_w" in arrays:
            params["att"].append(
                {k: jnp.asarray(arrays[f"att{c}_{k}"]) for k in ("w", "wb", "h", "ew", "eb")}
            )
            c += 1
        model.model_params = params
        return model


@jax.jit
def _afm_predict(params, indices, values, embeddings):
    return afm_forward(params, indices, values, list(embeddings))
