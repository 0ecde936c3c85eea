"""Item-to-item similarity recommenders.

Covers the reference's logics/item_to_item.go. Five similarity types
(factory :71-98): ``embedding`` (vector distance), ``tags`` (IDF-weighted
label sets), ``users`` (IDF-weighted co-consumption), ``auto`` (tags+users
averaged), ``chat`` (LLM-generated queries -> embedding search; see
logics/chat.py).

TPU-native difference: the reference pushes every item into an HNSW graph and
queries per item; here ``pop_all`` computes ALL pairwise neighborhoods in one
batched device pass (blocked matmuls: ops/similarity.py), which is exact and
faster at catalog scales.
"""

from __future__ import annotations

import dataclasses
import hashlib
import time

import jax.numpy as jnp
import numpy as np

from ..ops.similarity import embedding_neighbors, idf_neighbors, incidence_matrix
from ..storage.types import Item, Score


def derive_idf(label_lists: list[list[int]], n_docs: int) -> np.ndarray:
    """IDF weights from a pushed corpus: log(N / doc-frequency) (reference:
    the IDF derivations in logics/item_to_item.go:324-366)."""
    n_labels = max((max(l) + 1 for l in label_lists if l), default=1)
    counts = np.zeros(n_labels)
    for ls in label_lists:
        for l in ls:
            counts[l] += 1
    return np.log(max(n_docs, 1) / np.maximum(counts, 1)).astype(np.float32)


@dataclasses.dataclass
class ItemToItemConfig:
    """Mirror of config.ItemToItemConfig."""

    name: str
    type: str = "auto"  # embedding | tags | users | auto | chat
    column: str = ""  # embedding source: item.labels key holding a vector
    categories: list[str] = dataclasses.field(default_factory=list)
    prompt: str = ""  # chat type: jinja template rendered per item

    def digest(self) -> str:
        return hashlib.md5(
            f"{self.name}|{self.type}|{self.column}|{','.join(self.categories)}|{self.prompt}".encode()
        ).hexdigest()


class BaseItemToItem:
    """Accumulates items host-side, computes neighbors in one device pass."""

    def __init__(self, cfg: ItemToItemConfig, n: int, timestamp: float | None = None) -> None:
        self.cfg = cfg
        self.name = cfg.name
        self.n = n
        self.timestamp = timestamp if timestamp is not None else time.time()
        self.items: list[Item] = []

    def push(self, item: Item, feedback: list[int]) -> None:
        raise NotImplementedError

    def pop_all(self) -> list[tuple[str, list[Score]]]:
        """Return (item_id, neighbors) for every pushed item."""
        raise NotImplementedError

    def _emit(self, dists: np.ndarray, idxs: np.ndarray) -> list[tuple[str, list[Score]]]:
        out = []
        for row, item in enumerate(self.items):
            scores = []
            for d, j in zip(dists[row], idxs[row]):
                if d >= 1e29:  # padding / self sentinel
                    continue
                neighbor = self.items[int(j)]
                scores.append(
                    Score(
                        id=neighbor.item_id,
                        # positive similarity 1/(1+distance) like the
                        # reference (item_to_item.go:164): the recommender
                        # chain SUMS neighbor scores across the user's
                        # history, so more corroborating neighbors must
                        # raise — not lower — an item's aggregate
                        score=1.0 / (1.0 + float(d)),
                        categories=neighbor.categories,
                        timestamp=self.timestamp,
                    )
                )
            out.append((item.item_id, scores))
        return out


class EmbeddingItemToItem(BaseItemToItem):
    """Vector-embedding similarity (reference :100-168, HNSW Euclidean)."""

    def __init__(self, cfg: ItemToItemConfig, n: int, timestamp: float | None = None) -> None:
        super().__init__(cfg, n, timestamp)
        self.vectors: list[np.ndarray] = []

    def push(self, item: Item, feedback: list[int]) -> None:
        vec = _extract_embedding(item, self.cfg.column)
        if vec is None:
            return
        self.items.append(item)
        self.vectors.append(vec)

    def pop_all(self):
        if not self.items:
            return []
        x = jnp.asarray(np.stack(self.vectors))
        k = min(self.n, len(self.items) - 1)
        if k <= 0:
            return [(i.item_id, []) for i in self.items]
        dists, idxs = embedding_neighbors(x, k_top=k, metric="euclidean")
        return self._emit(np.asarray(dists), np.asarray(idxs))


class TagsItemToItem(BaseItemToItem):
    """IDF-weighted tag-set similarity (reference :170-237)."""

    def __init__(self, cfg, n, timestamp=None, idf: np.ndarray | None = None, label_index=None):
        super().__init__(cfg, n, timestamp)
        self.idf = idf
        self.label_index = label_index  # FreqDict mapping label -> id
        self.label_lists: list[list[int]] = []
        # exact local ids when no label index was supplied — Python's
        # per-process randomized str hash would make neighbors
        # non-reproducible across restarts and silently merge colliding labels
        self._local_ids: dict[str, int] = {}

    def _labels_of(self, item: Item) -> list[int]:
        labels = _flatten_labels(item.labels)
        if self.label_index is not None:
            return sorted(
                {self.label_index.to_number(l) for l in labels} - {-1}
            )
        return sorted(
            {self._local_ids.setdefault(l, len(self._local_ids)) for l in labels}
        )

    def push(self, item: Item, feedback: list[int]) -> None:
        self.items.append(item)
        self.label_lists.append(self._labels_of(item))

    def _neighbors(self, ragged: list[list[int]], idf: np.ndarray):
        n_labels = len(idf)
        inc = incidence_matrix(ragged, n_labels)
        k = min(self.n, len(self.items) - 1)
        return idf_neighbors(jnp.asarray(inc), jnp.asarray(idf), k_top=k)

    def effective_idf(self) -> np.ndarray:
        """Configured IDF, or one derived from the pushed corpus."""
        if self.idf is not None:
            return self.idf
        return derive_idf(self.label_lists, len(self.items))

    def pop_all(self):
        if len(self.items) < 2:
            return [(i.item_id, []) for i in self.items]
        dists, idxs = self._neighbors(self.label_lists, self.effective_idf())
        return self._emit(np.asarray(dists), np.asarray(idxs))


class UsersItemToItem(TagsItemToItem):
    """Co-consumption similarity: the 'label set' of an item is the set of
    users who consumed it, IDF-weighted by user activity (reference :239-276)."""

    def __init__(self, cfg, n, timestamp=None, user_idf: np.ndarray | None = None):
        super().__init__(cfg, n, timestamp, idf=user_idf)

    def push(self, item: Item, feedback: list[int]) -> None:
        self.items.append(item)
        self.label_lists.append(sorted(set(feedback)))


class AutoItemToItem(BaseItemToItem):
    """Average of tag distance and user distance (reference :278-331)."""

    def __init__(self, cfg, n, timestamp=None, tag_idf=None, user_idf=None, label_index=None):
        super().__init__(cfg, n, timestamp)
        self.tags = TagsItemToItem(cfg, n, timestamp, idf=tag_idf, label_index=label_index)
        self.users = UsersItemToItem(cfg, n, timestamp, user_idf=user_idf)

    def push(self, item: Item, feedback: list[int]) -> None:
        self.items.append(item)
        self.tags.items.append(item)
        self.tags.label_lists.append(self.tags._labels_of(item))
        self.users.items.append(item)
        self.users.label_lists.append(sorted(set(feedback)))

    def pop_all(self):
        if len(self.items) < 2:
            return [(i.item_id, []) for i in self.items]
        import jax.numpy as jnp

        from ..ops.similarity import idf_neighbors_avg, incidence_matrix

        # blockwise average of the two halves' distances: every pair is
        # averaged exactly before top-k, but memory stays O(block*N) — a
        # dense [N, N] average is an O(N^2) cliff at catalog scale
        tag_idf = self.tags.effective_idf()
        user_idf = self.users.effective_idf()
        inc_tags = incidence_matrix(self.tags.label_lists, len(tag_idf))
        inc_users = incidence_matrix(self.users.label_lists, len(user_idf))
        k = min(self.n, len(self.items) - 1)
        dists, idxs = idf_neighbors_avg(
            jnp.asarray(inc_tags), jnp.asarray(tag_idf),
            jnp.asarray(inc_users), jnp.asarray(user_idf),
            k_top=k,
        )
        return self._emit(np.asarray(dists), np.asarray(idxs))


def _extract_embedding(item: Item, column: str) -> np.ndarray | None:
    """Pull a float vector out of item.labels by key (reference: the
    ``column`` OSQL expression item_to_item.go:71-85)."""
    labels = item.labels
    if not column:
        return np.asarray(labels, dtype=np.float32) if isinstance(labels, list) else None
    key = column.removeprefix("item.Labels.").removeprefix("labels.")
    if isinstance(labels, dict) and key in labels:
        v = labels[key]
        if isinstance(v, list) and v and isinstance(v[0], (int, float)):
            return np.asarray(v, dtype=np.float32)
    return None


def _flatten_labels(labels) -> list[str]:
    """Flatten free-form JSON labels to strings (reference: flatten
    item_to_item.go:369-382)."""
    out: list[str] = []
    if labels is None:
        return out
    if isinstance(labels, str):
        return [labels]
    if isinstance(labels, list):
        for v in labels:
            if isinstance(v, str):
                out.append(v)
        return out
    if isinstance(labels, dict):
        for key, v in labels.items():
            if isinstance(v, str):
                out.append(f"{key}:{v}")
            elif isinstance(v, list):
                out.extend(f"{key}:{x}" for x in v if isinstance(x, str))
            elif isinstance(v, dict):
                out.extend(f"{key}:{x}" for x in _flatten_labels(v))
    return out


def new_item_to_item(
    cfg: ItemToItemConfig,
    n: int,
    timestamp: float | None = None,
    tag_idf: np.ndarray | None = None,
    user_idf: np.ndarray | None = None,
    label_index=None,
    openai_client=None,
) -> BaseItemToItem:
    """Factory (reference: NewItemToItem logics/item_to_item.go:71-98)."""
    if cfg.type == "embedding":
        return EmbeddingItemToItem(cfg, n, timestamp)
    if cfg.type == "tags":
        return TagsItemToItem(cfg, n, timestamp, idf=tag_idf, label_index=label_index)
    if cfg.type == "users":
        return UsersItemToItem(cfg, n, timestamp, user_idf=user_idf)
    if cfg.type == "auto":
        return AutoItemToItem(cfg, n, timestamp, tag_idf=tag_idf, user_idf=user_idf, label_index=label_index)
    if cfg.type == "chat":
        from .chat import ChatItemToItem

        return ChatItemToItem(cfg, n, timestamp, openai_client=openai_client, prompt=cfg.prompt)
    raise ValueError(f"unknown item-to-item type {cfg.type!r}")
