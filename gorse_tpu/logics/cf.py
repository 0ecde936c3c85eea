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

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dict import FreqDict
from ..ops.topk import NEG_INF, prepare_items, topk_excluding
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
        user_predictable: np.ndarray | None = None,
        item_predictable: np.ndarray | None = None,
    ) -> None:
        self.user_factors = jnp.asarray(user_factors)
        self.item_factors = jnp.asarray(item_factors)
        n_items = item_factors.shape[0]
        # Predictability: entities without training feedback keep random-init
        # embeddings; the reference excludes them from the serving index
        # entirely (master/tasks.go:1014-1027). The kernel table is COMPACTED
        # to predictable rows so untrained noise can never crowd the top-k;
        # _serving_rows maps kernel row -> original item index.
        self.user_predictable = (
            np.ones(user_factors.shape[0], bool)
            if user_predictable is None else np.asarray(user_predictable, bool)
        )
        self.item_predictable = (
            np.ones(n_items, bool)
            if item_predictable is None else np.asarray(item_predictable, bool)
        )
        self._serving_rows = np.flatnonzero(self.item_predictable).astype(np.int32)
        self._inv_rows = np.full(max(n_items, 1), -1, np.int32)
        self._inv_rows[self._serving_rows] = np.arange(len(self._serving_rows), dtype=np.int32)
        if len(self._serving_rows) == n_items:
            # common case (every item has feedback): alias, don't copy —
            # a gathered duplicate of a large catalog doubles device memory
            self._serving_factors = self.item_factors
        else:
            self._serving_factors = self.item_factors[jnp.asarray(self._serving_rows)]
        # transposed table built once so serving calls skip the relayout.
        # bf16 like the reference's serving embeddings (common/bfloats):
        # halves the HBM stream per query batch; scores accumulate in f32.
        # (The XLA fallback path scores from the f32 table — orderings agree
        # to bf16 rounding.)
        self._prepared_items = prepare_items(self._serving_factors, jnp.bfloat16)
        self.user_index = user_index
        self.item_index = item_index
        self.item_categories = item_categories or [[] for _ in range(n_items)]
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
            user_predictable=getattr(model, "user_predictable", None),
            item_predictable=getattr(model, "item_predictable", None),
        )

    def serving_items(self) -> tuple[list[str], np.ndarray]:
        """(item ids, factors) for predictable items only — the rows the
        reference uploads to the vector store (master/tasks.go:1012-1021)."""
        ids = [self.item_index.to_name(int(i)) for i in self._serving_rows]
        return ids, np.asarray(self._serving_factors)

    def search_users(
        self,
        user_ids: list[str],
        n: int,
        exclude: list[list[str]] | None = None,
        use_pallas: bool | None = None,
        interpret: bool = False,
        approx_recall: float | None = None,
    ) -> list[list[Score]]:
        """Batched top-n recommendation for many users at once
        (reference: MatrixFactorizationItems.Search logics/cf.go:70-79,
        one user per call there; one device batch here).

        ``use_pallas=None`` (default) picks the fused Pallas kernel on TPU
        and the XLA path elsewhere (the kernel only runs compiled on TPU;
        interpret mode is for tests).

        The batch is processed in chunks of ``_SEARCH_CHUNK`` users: the
        Pallas kernel's VMEM buffers scale with both batch rows and the
        top-(n + exclude-width) fetch, and a worker hands this method its
        whole user shard at once — unchunked, a few thousand users (or one
        user with a very wide history) would blow the VMEM budget the
        kernel's block_n clamp cannot fix. Chunking also narrows each
        chunk's exclusion width to its own widest history. Chunks whose
        fetch width would still exceed ``_PALLAS_FETCH_MAX`` fall back to
        the XLA path (HBM-materialized scores, any width)."""
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        n_serving = len(self._serving_rows)
        if n_serving == 0:
            return [[] for _ in user_ids]
        n_eff = min(n, n_serving)
        out: list[list[Score]] = []
        for lo in range(0, len(user_ids), self._SEARCH_CHUNK):
            chunk_ids = user_ids[lo : lo + self._SEARCH_CHUNK]
            chunk_ex = exclude[lo : lo + self._SEARCH_CHUNK] if exclude else None
            out.extend(
                self._search_chunk(
                    chunk_ids, n_eff, chunk_ex, use_pallas, interpret,
                    approx_recall=approx_recall,
                )
            )
        return out

    _SEARCH_CHUNK = 256  # rows per kernel invocation (VMEM scales with rows)
    _PALLAS_FETCH_MAX = 2048  # top-(n+E) beyond this: XLA path (k_pad VMEM)

    def _search_chunk(
        self, user_ids, n_eff, exclude, use_pallas, interpret,
        approx_recall: float | None = None,
    ) -> list[list[Score]]:
        rows, valid = [], []
        for uid in user_ids:
            idx = self.user_index.to_number(uid)
            # untrained users (no feedback at fit time) get NO collaborative
            # recommendations — their factors are random init; the chain
            # falls back (reference: unpredictable users are absent from
            # MatrixFactorizationUsers, master/tasks.go:1023-1027)
            valid.append(idx >= 0 and bool(self.user_predictable[idx]))
            rows.append(max(idx, 0))
        queries = self.user_factors[jnp.asarray(rows, dtype=jnp.int32)]
        ex_arr = None
        width = 0
        if exclude is not None:
            width = max((len(e) for e in exclude), default=0)
            if width:
                ex = np.full((len(user_ids), width), -1, dtype=np.int32)
                for i, ids in enumerate(exclude):
                    for j, iid in enumerate(ids):
                        orig = self.item_index.to_number(iid)
                        # remap into the compacted serving table; ids outside
                        # it (unpredictable/unknown) are never returned anyway
                        ex[i, j] = self._inv_rows[orig] if orig >= 0 else -1
                ex_arr = jnp.asarray(ex)
        if n_eff + width > self._PALLAS_FETCH_MAX:
            use_pallas = False
        # the approx tier consumes the prepared layout directly — passing
        # the raw matrix would make it re-run prepare_items (full-table
        # transpose + cast) on EVERY chunk
        use_prepared = use_pallas or (
            approx_recall is not None and approx_recall < 1.0
        )
        scores, idxs = topk_excluding(
            queries,
            self._prepared_items if use_prepared else self._serving_factors,
            n_eff, ex_arr,
            use_pallas=use_pallas, interpret=interpret,
            approx_recall=approx_recall,
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
                orig = int(self._serving_rows[int(j)])
                row.append(
                    Score(
                        id=self.item_index.to_name(orig),
                        score=float(s),
                        categories=self.item_categories[orig],
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
        if idx < 0 or not self.user_predictable[idx]:
            return []
        norms = jnp.linalg.norm(self.user_factors, axis=1, keepdims=True)
        unit = self.user_factors / jnp.maximum(norms, 1e-12)
        # untrained users are noise in factor space: mask their SCORES to
        # -inf (zeroing their rows would give them cosine 0, which outranks
        # every negative-similarity real neighbor and silently truncates the
        # result below n)
        scores = unit @ unit[idx]
        mask = jnp.asarray(self.user_predictable)
        scores = jnp.where(mask, scores, NEG_INF).at[idx].set(NEG_INF)
        n_eff = min(n, self.user_factors.shape[0] - 1)
        top_s, top_i = jax.lax.top_k(scores, max(n_eff, 0))
        out = []
        for s, j in zip(np.asarray(top_s), np.asarray(top_i)):
            if s <= NEG_INF / 2:
                break
            out.append(Score(id=self.user_index.to_name(int(j)), score=float(s)))
        return out

    # ------------------------------------------------------------- serialize

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez(
            path / "index.npz",
            user_factors=np.asarray(self.user_factors),
            item_factors=np.asarray(self.item_factors),
            user_predictable=self.user_predictable,
            item_predictable=self.item_predictable,
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
            user_predictable=arrays.get("user_predictable"),
            item_predictable=arrays.get("item_predictable"),
        )
