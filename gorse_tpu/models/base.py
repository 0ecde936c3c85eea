"""Matrix-factorization base model + sampled-candidate evaluation.

Covers the reference's model/cf/model.go BaseMatrixFactorization (factor
storage, predict, marshal) and model/cf/evaluator.go Evaluate (per-user
sampled-candidate ranking). The evaluation here is a single device batch
rather than a goroutine loop: candidates [U, M] are scored as a batched
gather+dot and ranked with lax.top_k.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import Dataset
from ..ops.metrics import rank_metrics
from .params import Params


@dataclasses.dataclass
class Score:
    """Fit result (reference: model/cf/model.go Score)."""

    ndcg: float
    precision: float
    recall: float

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


class MatrixFactorization:
    """Base MF model: user/item factor tables + sampled evaluation.

    Factors are float32 device arrays. Subclasses (BPR, ALS) implement
    ``fit``. Reference: model/cf/model.go:98-307.
    """

    name = "base"

    def __init__(self, params: Params | dict | None = None) -> None:
        self.params = Params(params or {})
        self.user_factors: jax.Array | None = None  # [U, k] f32
        self.item_factors: jax.Array | None = None  # [I, k] f32
        # string dictionaries captured at fit time for serving lookups
        self.user_index = None
        self.item_index = None
        # predictability bitsets: users/items with NO training feedback keep
        # their random-init embeddings and must never be served (reference:
        # BaseMatrixFactorization.UserPredictable/ItemPredictable,
        # model/cf/model.go:118-156; consumed when building the serving
        # index, master/tasks.go:1014-1027)
        self.user_predictable: np.ndarray | None = None  # [U] bool
        self.item_predictable: np.ndarray | None = None  # [I] bool

    def init(self, train: Dataset, seed: int = 0) -> None:
        """Gaussian factor init + dictionary capture (shared by BPR/ALS;
        subclasses provide n_factors/init_mean/init_stddev)."""
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.user_factors = (
            self.init_mean
            + self.init_stddev * jax.random.normal(k1, (train.count_users(), self.n_factors))
        ).astype(jnp.float32)
        self.item_factors = (
            self.init_mean
            + self.init_stddev * jax.random.normal(k2, (train.count_items(), self.n_factors))
        ).astype(jnp.float32)
        self.user_index = train.user_dict
        self.item_index = train.item_dict
        self.user_predictable = np.fromiter(
            (len(fb) > 0 for fb in train.user_feedback), bool, train.count_users()
        )
        self.item_predictable = np.fromiter(
            (len(fb) > 0 for fb in train.item_feedback), bool, train.count_items()
        )

    # ------------------------------------------------------------ prediction

    def predict(self, user_indices, item_indices) -> jax.Array:
        """Batched dot-product predictions for (user, item) id pairs."""
        pu = jnp.take(self.user_factors, jnp.asarray(user_indices), axis=0)
        qi = jnp.take(self.item_factors, jnp.asarray(item_indices), axis=0)
        return jnp.sum(pu * qi, axis=-1)

    def is_fitted(self) -> bool:
        return self.user_factors is not None

    # ------------------------------------------------------------- serialize

    def save(self, path: str | Path) -> None:
        """Persist factors + params (reference: model/cf/model.go Marshal)."""
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        arrays = {
            "user_factors": np.asarray(self.user_factors),
            "item_factors": np.asarray(self.item_factors),
        }
        if self.user_predictable is not None:
            arrays["user_predictable"] = self.user_predictable
            arrays["item_predictable"] = self.item_predictable
        np.savez(path / "factors.npz", **arrays)
        meta = {"name": self.name, "params": dict(self.params)}
        if self.user_index is not None:
            meta["user_index"] = self.user_index.to_dict()
            meta["item_index"] = self.item_index.to_dict()
        (path / "meta.json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, path: str | Path) -> "MatrixFactorization":
        from .registry import create_mf_model  # local import to avoid cycle

        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        model = create_mf_model(meta["name"], Params(meta["params"]))
        arrays = np.load(path / "factors.npz")
        model.user_factors = jnp.asarray(arrays["user_factors"])
        model.item_factors = jnp.asarray(arrays["item_factors"])
        if "user_predictable" in arrays:
            model.user_predictable = arrays["user_predictable"]
            model.item_predictable = arrays["item_predictable"]
        if "user_index" in meta:
            from ..data.dict import FreqDict

            model.user_index = FreqDict.from_dict(meta["user_index"])
            model.item_index = FreqDict.from_dict(meta["item_index"])
        return model


def build_eval_candidates(
    test: Dataset, train: Dataset, n_candidates: int = 100, seed: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the padded candidate tensor for sampled evaluation.

    Returns (candidates [U, Tmax+C] int32, is_target bool, valid bool).
    Per user: test positives first (padded), then ``n_candidates`` sampled
    negatives excluding train+test positives — exactly the reference protocol
    (model/cf/evaluator.go:43-55).
    """
    negatives = test.sample_user_negatives(train, n_candidates, seed=seed)
    n_cand = negatives.shape[1]  # may be < n_candidates with file negatives
    n_users = test.count_users()
    t_max = max((len(fb) for fb in test.user_feedback), default=1) or 1
    m = t_max + n_cand
    candidates = np.zeros((n_users, m), dtype=np.int32)
    is_target = np.zeros((n_users, m), dtype=bool)
    valid = np.zeros((n_users, m), dtype=bool)
    for u in range(n_users):
        fb = test.user_feedback[u]
        t = len(fb)
        if t:
            candidates[u, :t] = fb
            is_target[u, :t] = True
            valid[u, :t] = True
            negs = negatives[u]
            candidates[u, t_max:] = np.maximum(negs, 0)
            valid[u, t_max:] = negs >= 0  # -1 pads (short file rows) masked
    return candidates, is_target, valid


def evaluate_mf(
    user_factors: jax.Array,
    item_factors: jax.Array,
    candidates: np.ndarray,
    is_target: np.ndarray,
    valid: np.ndarray,
    top_k: int = 10,
) -> dict[str, float]:
    """Sampled-candidate evaluation of MF factors (jit-compiled inside)."""
    scores = _mf_candidate_scores(user_factors, item_factors, jnp.asarray(candidates))
    out = rank_metrics(scores, jnp.asarray(is_target), jnp.asarray(valid), top_k=top_k)
    return {k: float(v) for k, v in out.items()}


@jax.jit
def _mf_candidate_scores(user_factors, item_factors, candidates):
    q = jnp.take(item_factors, candidates, axis=0)  # [U, M, k]
    return jnp.einsum("uk,umk->um", user_factors, q)


def evaluate_model(
    model: MatrixFactorization,
    test: Dataset,
    train: Dataset,
    top_k: int = 10,
    n_candidates: int = 100,
) -> dict[str, float]:
    """Evaluate a fitted MF model (reference: model/cf/evaluator.go:35-72)."""
    cands, is_target, valid = build_eval_candidates(test, train, n_candidates)
    return evaluate_mf(model.user_factors, model.item_factors, cands, is_target, valid, top_k)
