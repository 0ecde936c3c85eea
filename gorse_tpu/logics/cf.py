"""Matrix-factorization serving indexes.

Covers the reference's logics/cf.go: ``MatrixFactorizationItems`` (:36-124)
serves per-user top-k over item factors, ``MatrixFactorizationUsers``
(:126-177) serves user factor lookups for collaborative scoring. The
reference brute-forces a dot product per user in Go; here search is the
batched Pallas/XLA top-k kernel (ops/topk.py) over the whole user shard at
once.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..data.dict import FreqDict
from ..ops.topk import prepare_items, topk_excluding
from ..storage.types import Score


class MatrixFactorizationIndex:
    """Item/user factor tables + dictionaries, built from a fitted MF model."""

    def __init__(
        self,
        user_factors: np.ndarray,
        item_factors: np.ndarray,
        user_index: FreqDict,
        item_index: FreqDict,
        item_categories: list[list[str]] | None = None,
        timestamp: float = 0.0,
    ) -> None:
        self.user_factors = jnp.asarray(user_factors)
        self.item_factors = jnp.asarray(item_factors)
        # transposed table built once so serving calls skip the relayout
        self._prepared_items = prepare_items(self.item_factors)
        self.user_index = user_index
        self.item_index = item_index
        self.item_categories = item_categories or [[] for _ in range(item_factors.shape[0])]
        self.timestamp = timestamp

    @classmethod
    def from_model(cls, model, item_categories=None, timestamp: float = 0.0):
        return cls(
            np.asarray(model.user_factors),
            np.asarray(model.item_factors),
            model.user_index,
            model.item_index,
            item_categories,
            timestamp,
        )

    def search_users(
        self,
        user_ids: list[str],
        n: int,
        exclude: list[list[str]] | None = None,
        use_pallas: bool = True,
        interpret: bool = False,
    ) -> list[list[Score]]:
        """Batched top-n recommendation for many users at once
        (reference: MatrixFactorizationItems.Search logics/cf.go:70-79,
        one user per call there; one device batch here)."""
        rows, valid = [], []
        for uid in user_ids:
            idx = self.user_index.to_number(uid)
            valid.append(idx >= 0)
            rows.append(max(idx, 0))
        queries = self.user_factors[jnp.asarray(rows, dtype=jnp.int32)]
        ex_arr = None
        if exclude is not None:
            width = max((len(e) for e in exclude), default=0)
            if width:
                ex = np.full((len(user_ids), width), -1, dtype=np.int32)
                for i, ids in enumerate(exclude):
                    for j, iid in enumerate(ids):
                        ex[i, j] = self.item_index.to_number(iid)
                ex_arr = jnp.asarray(ex)
        n_eff = min(n, self.item_factors.shape[0])
        scores, idxs = topk_excluding(
            queries,
            self._prepared_items if use_pallas else self.item_factors,
            n_eff, ex_arr,
            use_pallas=use_pallas, interpret=interpret,
        )
        scores = np.asarray(scores)
        idxs = np.asarray(idxs)
        out: list[list[Score]] = []
        for i, uid in enumerate(user_ids):
            if not valid[i]:
                out.append([])
                continue
            row = []
            for s, j in zip(scores[i], idxs[i]):
                if s <= -1e29:
                    continue
                row.append(
                    Score(
                        id=self.item_index.to_name(int(j)),
                        score=float(s),
                        categories=self.item_categories[int(j)],
                        timestamp=self.timestamp,
                    )
                )
            out.append(row)
        return out

    def similar_users(self, user_id: str, n: int) -> list[Score]:
        """Nearest users in factor space by COSINE (raw dot products are
        dominated by factor norm — a heavy user outranks an identical-taste
        user; extension API, the reference's MatrixFactorizationUsers is a
        plain embedding lookup)."""
        idx = self.user_index.to_number(user_id)
        if idx < 0:
            return []
        norms = jnp.linalg.norm(self.user_factors, axis=1, keepdims=True)
        unit = self.user_factors / jnp.maximum(norms, 1e-12)
        q = unit[jnp.asarray([idx])]
        n_eff = min(n + 1, self.user_factors.shape[0])
        scores, idxs = topk_excluding(q, unit, n_eff, use_pallas=False)
        out = []
        for s, j in zip(np.asarray(scores)[0], np.asarray(idxs)[0]):
            if int(j) == idx:
                continue
            out.append(Score(id=self.user_index.to_name(int(j)), score=float(s)))
        return out[:n]

    # ------------------------------------------------------------- serialize

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez(
            path / "index.npz",
            user_factors=np.asarray(self.user_factors),
            item_factors=np.asarray(self.item_factors),
        )
        (path / "index_meta.json").write_text(
            json.dumps(
                {
                    "user_index": self.user_index.to_dict(),
                    "item_index": self.item_index.to_dict(),
                    "item_categories": self.item_categories,
                    "timestamp": self.timestamp,
                }
            )
        )

    @classmethod
    def load(cls, path: str | Path) -> "MatrixFactorizationIndex":
        path = Path(path)
        arrays = np.load(path / "index.npz")
        meta = json.loads((path / "index_meta.json").read_text())
        return cls(
            arrays["user_factors"],
            arrays["item_factors"],
            FreqDict.from_dict(meta["user_index"]),
            FreqDict.from_dict(meta["item_index"]),
            meta["item_categories"],
            meta["timestamp"],
        )
