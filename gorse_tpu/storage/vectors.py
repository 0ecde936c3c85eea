"""Vector store: named collections with top-k similarity queries.

Covers the reference's storage/vectors/database.go (:85-96): collections of
(id, vector) rows with add/delete/query-top-k, used for CF factor serving
(master/master.go:424-478). The reference plugs SQLite/Milvus/Qdrant/
Weaviate behind this interface; here the memory and SQLite backends execute
queries with the device top-k kernels (exact, not ANN — SURVEY.md §7 design
stance), so a TPU serves as the "vector database" accelerator.
"""

from __future__ import annotations

import json
import sqlite3
import threading

import numpy as np

from .types import Score


class VectorStore:
    """Abstract vector store (storage/vectors/database.go:85-96)."""

    def create_collection(self, name: str, dimensions: int) -> None:
        raise NotImplementedError

    def has_collection(self, name: str) -> bool:
        raise NotImplementedError

    def drop_collection(self, name: str) -> None:
        raise NotImplementedError

    def add(self, collection: str, ids: list[str], vectors: np.ndarray) -> None:
        raise NotImplementedError

    def delete(self, collection: str, ids: list[str]) -> None:
        raise NotImplementedError

    def query(self, collection: str, vectors: np.ndarray, k: int) -> list[list[Score]]:
        """Top-k by dot product for each query vector."""
        raise NotImplementedError

    def ping(self) -> bool:
        return True

    def close(self) -> None:
        pass


class MemoryVectorStore(VectorStore):
    """In-memory vector store querying through the exact top-k kernel."""

    def __init__(self) -> None:
        self._lock = threading.RLock()
        # name -> (dimensions, {id: vector})
        self._collections: dict[str, tuple[int, dict[str, np.ndarray]]] = {}

    def create_collection(self, name: str, dimensions: int) -> None:
        with self._lock:
            if name not in self._collections:
                self._collections[name] = (dimensions, {})

    def has_collection(self, name: str) -> bool:
        return name in self._collections

    def drop_collection(self, name: str) -> None:
        with self._lock:
            self._collections.pop(name, None)

    def dimensions(self, name: str) -> int:
        return self._collections[name][0]

    def add(self, collection: str, ids: list[str], vectors: np.ndarray) -> None:
        with self._lock:
            dim, rows = self._collections[collection]
            vectors = np.asarray(vectors, dtype=np.float32)
            assert vectors.shape[1] == dim, f"dimension mismatch: {vectors.shape[1]} != {dim}"
            for i, vid in enumerate(ids):
                rows[vid] = vectors[i]

    def delete(self, collection: str, ids: list[str]) -> None:
        with self._lock:
            _, rows = self._collections[collection]
            for vid in ids:
                rows.pop(vid, None)

    def query(self, collection: str, vectors: np.ndarray, k: int) -> list[list[Score]]:
        import jax.numpy as jnp

        from ..ops.topk import dot_topk_xla

        with self._lock:
            _, rows = self._collections[collection]
            if not rows:
                return [[] for _ in range(len(vectors))]
            ids = list(rows)
            matrix = np.stack([rows[i] for i in ids])
        k_eff = min(k, len(ids))
        scores, idxs = dot_topk_xla(
            jnp.asarray(np.asarray(vectors, dtype=np.float32)), jnp.asarray(matrix), k_eff
        )
        scores, idxs = np.asarray(scores), np.asarray(idxs)
        return [
            [Score(id=ids[int(j)], score=float(s)) for s, j in zip(scores[b], idxs[b])]
            for b in range(len(vectors))
        ]


class SQLiteVectorStore(MemoryVectorStore):
    """SQLite persistence with in-memory query acceleration: vectors are
    durable rows; queries run on the device kernel over a cached matrix."""

    def __init__(self, path: str = ":memory:") -> None:
        super().__init__()
        self._conn = sqlite3.connect(path, check_same_thread=False)
        with self._lock:
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS collections (name TEXT PRIMARY KEY, dimensions INTEGER)"
            )
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS vectors (collection TEXT, id TEXT, vector TEXT, PRIMARY KEY (collection, id))"
            )
            self._conn.commit()
            # warm the in-memory view
            for name, dim in self._conn.execute("SELECT name, dimensions FROM collections"):
                super().create_collection(name, dim)
                for vid, vec in self._conn.execute(
                    "SELECT id, vector FROM vectors WHERE collection = ?", (name,)
                ):
                    self._collections[name][1][vid] = np.asarray(
                        json.loads(vec), dtype=np.float32
                    )

    def create_collection(self, name: str, dimensions: int) -> None:
        super().create_collection(name, dimensions)
        with self._lock:
            self._conn.execute(
                "INSERT OR IGNORE INTO collections VALUES (?, ?)", (name, dimensions)
            )
            self._conn.commit()

    def drop_collection(self, name: str) -> None:
        super().drop_collection(name)
        with self._lock:
            self._conn.execute("DELETE FROM collections WHERE name = ?", (name,))
            self._conn.execute("DELETE FROM vectors WHERE collection = ?", (name,))
            self._conn.commit()

    def add(self, collection: str, ids: list[str], vectors: np.ndarray) -> None:
        super().add(collection, ids, vectors)
        with self._lock:
            self._conn.executemany(
                "INSERT OR REPLACE INTO vectors VALUES (?, ?, ?)",
                [
                    (collection, vid, json.dumps(np.asarray(v, dtype=float).tolist()))
                    for vid, v in zip(ids, np.asarray(vectors))
                ],
            )
            self._conn.commit()

    def delete(self, collection: str, ids: list[str]) -> None:
        super().delete(collection, ids)
        with self._lock:
            self._conn.executemany(
                "DELETE FROM vectors WHERE collection = ? AND id = ?",
                [(collection, vid) for vid in ids],
            )
            self._conn.commit()

    def close(self) -> None:
        self._conn.close()


def open_vector_store(url: str) -> VectorStore:
    if url.startswith("memory://") or url == "memory":
        return MemoryVectorStore()
    if url.startswith("sqlite://"):
        return SQLiteVectorStore(url[len("sqlite://"):] or ":memory:")
    if url.startswith("proxy://"):
        from .proxy import ProxyVectorStore

        return ProxyVectorStore(url[len("proxy://"):])
    raise ValueError(f"unsupported vector store URL {url!r}")
