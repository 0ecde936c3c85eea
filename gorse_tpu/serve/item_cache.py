"""Worker-local item metadata cache with BF16 embedding compression.

Covers the reference's ItemCache (worker/pipeline.go:42-77): workers hold the
item metadata their pipeline touches in memory, compressing any numeric
vectors inside free-form labels to BF16 (halving embedding memory, exactly
the reference's `compressLabelsEmbeddings` + bfloats) and interning repeated
strings (the strutil.GoPool analog). On top of the memory parity, the cache
batches store reads — one `batch_get_items` round trip per pipeline run —
which matters when the data store is the master's gRPC proxy.
"""

from __future__ import annotations

import sys
import threading

import numpy as np

from ..storage.types import Item

try:  # ml_dtypes ships with jax
    from ml_dtypes import bfloat16 as _bf16
except ImportError:  # pragma: no cover - jax always provides it here
    _bf16 = np.float32


def compress_labels(labels):
    """Recursively compress label JSON: numeric vectors -> BF16 arrays,
    strings interned (reference: compressLabelsEmbeddings
    worker/pipeline.go:44-77)."""
    if labels is None:
        return None
    if isinstance(labels, str):
        return sys.intern(labels)
    if isinstance(labels, dict):
        return {sys.intern(k): compress_labels(v) for k, v in labels.items()}
    if isinstance(labels, np.ndarray):
        return labels.astype(_bf16) if labels.dtype.kind == "f" else labels
    if isinstance(labels, (list, tuple)):
        if labels and all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in labels):
            # an embedding vector (reference: bfloats.FromAny)
            return np.asarray(labels, dtype=np.float32).astype(_bf16)
        return [compress_labels(v) for v in labels]
    return labels


def decompress_labels(labels):
    """Back to plain JSON-compatible values (BF16 arrays -> float lists)."""
    if isinstance(labels, np.ndarray):
        return [float(x) for x in labels.astype(np.float32)]
    if isinstance(labels, dict):
        return {k: decompress_labels(v) for k, v in labels.items()}
    if isinstance(labels, list):
        return [decompress_labels(v) for v in labels]
    return labels


class ItemCache:
    """Reference: worker.ItemCache (worker/pipeline.go:42,616-667)."""

    def __init__(self, data_store) -> None:
        self._data = data_store
        self._lock = threading.RLock()
        self._items: dict[str, Item | None] = {}

    def clear(self) -> None:
        with self._lock:
            self._items.clear()

    def prefetch(self, item_ids) -> None:
        """Load many items in one store round trip."""
        with self._lock:
            missing = [i for i in dict.fromkeys(item_ids) if i not in self._items]
            if not missing:
                return
            found = {it.item_id: it for it in self._data.batch_get_items(missing)}
            for iid in missing:
                self._items[iid] = self._compress(found.get(iid))

    @staticmethod
    def _compress(item: Item | None) -> Item | None:
        if item is None:
            return None
        return Item(
            item_id=sys.intern(item.item_id),
            is_hidden=item.is_hidden,
            categories=[sys.intern(c) for c in item.categories],
            timestamp=item.timestamp,
            labels=compress_labels(item.labels),
            comment=item.comment,
        )

    def get(self, item_id: str) -> Item | None:
        with self._lock:
            if item_id not in self._items:
                self._items[item_id] = self._compress(self._data.get_item(item_id))
            return self._items[item_id]

    def __len__(self) -> int:
        return sum(1 for v in self._items.values() if v is not None)
