"""CTR (click-through-rate) dataset: sparse libFM-style rows.

Covers the reference's model/ctr/data.go: samples are sparse
(feature-id, value) lists with a binary target, plus optional dense item
embedding features. Device view is padded [N, D] index/value matrices
(pad index 0 with value 0 contributes nothing to an FM forward pass).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .unified_index import DirectIndex, UnifiedIndex


@dataclasses.dataclass
class PaddedCTR:
    indices: np.ndarray  # [N, D] int32, pad 0
    values: np.ndarray  # [N, D] f32, pad 0
    valid: np.ndarray  # [N, D] bool, False on padding slots
    targets: np.ndarray  # [N] f32 in {0, 1}
    embeddings: list[np.ndarray]  # per embedding column: [N, dim] f32


class CTRDataset:
    """Sparse CTR dataset (reference: model/ctr/data.go:152-268)."""

    def __init__(self, index: UnifiedIndex | DirectIndex | None = None) -> None:
        self.index = index or UnifiedIndex()
        self.features: list[tuple[list[int], list[float]]] = []
        self.targets: list[float] = []
        self.timestamps: list[float] = []
        self.users: list[int] = []  # per-sample user id (for user-time split), -1 unknown
        # dense embedding features: list of columns; each column is a list of
        # per-sample vectors (or None)
        self.embedding_dims: list[int] = []
        self.embeddings: list[list[np.ndarray | None]] = []

    def add(
        self,
        indices: list[int],
        values: list[float],
        target: float,
        user: int = -1,
        timestamp: float = 0.0,
        embeddings: list[np.ndarray | None] | None = None,
    ) -> None:
        self.features.append((list(indices), list(values)))
        self.targets.append(float(target))
        self.users.append(user)
        self.timestamps.append(timestamp)
        if embeddings is not None:
            for c, e in enumerate(embeddings):
                self.embeddings[c].append(e)
        else:
            for c in range(len(self.embedding_dims)):
                self.embeddings[c].append(None)

    def __len__(self) -> int:
        return len(self.targets)

    def count_positive(self) -> int:
        return int(sum(1 for t in self.targets if t > 0.5))

    def count_negative(self) -> int:
        return len(self) - self.count_positive()

    def num_features(self) -> int:
        return len(self.index)

    def max_dimension(self) -> int:
        return max((len(f[0]) for f in self.features), default=1) or 1

    # ---------------------------------------------------------- device view

    def padded(self, pad_to: int | None = None) -> PaddedCTR:
        n = len(self)
        d = max(pad_to or self.max_dimension(), 1)
        indices = np.zeros((n, d), dtype=np.int32)
        values = np.zeros((n, d), dtype=np.float32)
        valid = np.zeros((n, d), dtype=bool)
        for i, (idx, val) in enumerate(self.features):
            m = len(idx)
            indices[i, :m] = idx
            values[i, :m] = val
            valid[i, :m] = True
        targets = np.asarray(self.targets, dtype=np.float32)
        embs = []
        for c, dim in enumerate(self.embedding_dims):
            col = np.zeros((n, dim), dtype=np.float32)
            for i, e in enumerate(self.embeddings[c]):
                if e is not None:
                    col[i] = e
            embs.append(col)
        return PaddedCTR(indices=indices, values=values, valid=valid, targets=targets, embeddings=embs)

    # ---------------------------------------------------------------- splits

    def _empty(self) -> "CTRDataset":
        out = CTRDataset(self.index)
        out.embedding_dims = self.embedding_dims
        out.embeddings = [[] for _ in self.embedding_dims]
        return out

    def _append_to(self, dst: "CTRDataset", i: int) -> None:
        dst.features.append(self.features[i])
        dst.targets.append(self.targets[i])
        dst.users.append(self.users[i])
        dst.timestamps.append(self.timestamps[i])
        for c in range(len(self.embedding_dims)):
            dst.embeddings[c].append(self.embeddings[c][i])

    def split(self, ratio: float = 0.2, seed: int = 0) -> tuple["CTRDataset", "CTRDataset"]:
        """Random split (reference: model/ctr/data.go:340-397)."""
        rng = np.random.default_rng(seed)
        n = len(self)
        order = rng.permutation(n)
        n_test = int(n * ratio)
        train, test = self._empty(), self._empty()
        for i in order[n_test:]:
            self._append_to(train, int(i))
        for i in order[:n_test]:
            self._append_to(test, int(i))
        return train, test

    def split_by_user_time(self, ratio: float = 0.2) -> tuple["CTRDataset", "CTRDataset"]:
        """Per-user temporal split: each user's most recent ``ratio`` of
        samples go to test (reference: model/ctr/data.go:399-445)."""
        by_user: dict[int, list[int]] = {}
        for i, u in enumerate(self.users):
            by_user.setdefault(u, []).append(i)
        train, test = self._empty(), self._empty()
        for u, idxs in by_user.items():
            idxs.sort(key=lambda i: self.timestamps[i])
            n_test = int(len(idxs) * ratio)
            cut = len(idxs) - n_test
            for i in idxs[:cut]:
                self._append_to(train, i)
            for i in idxs[cut:]:
                self._append_to(test, i)
        return train, test


def load_libfm_file(path: str) -> CTRDataset:
    """Load a libFM-format file: ``target idx:val idx:val ...`` per line
    (reference: model/ctr/data.go:270-318). Uses the native C++ parser
    (gorse_tpu.native) when available; pure-Python fallback otherwise."""
    from ..native import parse_libfm_bytes

    with open(path, "rb") as f:
        buf = f.read()
    parsed = parse_libfm_bytes(buf)
    if parsed is not None:
        targets, indptr, indices, values, max_label = parsed
        d = CTRDataset(DirectIndex(int(max_label) + 1))
        for r in range(len(targets)):
            lo, hi = int(indptr[r]), int(indptr[r + 1])
            d.add(indices[lo:hi].tolist(), values[lo:hi].tolist(), float(targets[r]))
        return d
    features: list[tuple[list[int], list[float]]] = []
    targets_list: list[float] = []
    max_label = 0
    for line in buf.decode().splitlines():
        fields = line.strip().split()
        if not fields:
            continue
        targets_list.append(max(float(fields[0]), 0.0))  # -1 -> 0
        idx, val = [], []
        for tok in fields[1:]:
            k, _, v = tok.partition(":")
            k = int(k)
            idx.append(k)
            val.append(float(v) if v else 1.0)
            max_label = max(max_label, k)
        features.append((idx, val))
    d = CTRDataset(DirectIndex(max_label + 1))
    for (idx, val), t in zip(features, targets_list):
        d.add(idx, val, t)
    return d


def load_libfm(train_path: str, test_path: str) -> tuple[CTRDataset, CTRDataset]:
    train = load_libfm_file(train_path)
    test = load_libfm_file(test_path)
    n = max(len(train.index), len(test.index))
    train.index = DirectIndex(n)
    test.index = train.index
    return train, test


def synthetic_ctr(
    n_users: int = 200,
    n_items: int = 150,
    n_user_labels: int = 20,
    n_item_labels: int = 30,
    rank: int = 4,
    n_samples: int = 5000,
    seed: int = 0,
    numerical: bool = False,
) -> CTRDataset:
    """Low-rank ground-truth CTR dataset.

    Each sample is (user one-hot, item one-hot, a few label one-hots); the
    binary target is Bernoulli(sigmoid(latent FM score)), so a correct FM
    learner must reach high AUC — the egress-free analog of the reference's
    frappe/criteo accuracy gates (model/ctr/model_test.go:35-91).
    """
    rng = np.random.default_rng(seed)
    index = UnifiedIndex()
    for u in range(n_users):
        index.users.add(f"u{u}")
    for i in range(n_items):
        index.items.add(f"i{i}")
    for l in range(n_user_labels):
        index.user_labels.add(f"ul{l}")
    for l in range(n_item_labels):
        index.item_labels.add(f"il{l}")
    n_feat = len(index)
    v = rng.normal(scale=0.9, size=(n_feat, rank))
    w = rng.normal(scale=0.5, size=n_feat)
    d = CTRDataset(index)
    user_label = rng.integers(n_user_labels, size=n_users)
    item_label = rng.integers(n_item_labels, size=n_items)
    for _ in range(n_samples):
        u = int(rng.integers(n_users))
        i = int(rng.integers(n_items))
        idx = [
            u,
            index.item_offset + i,
            index.user_label_offset + int(user_label[u]),
            index.item_label_offset + int(item_label[i]),
        ]
        val = [1.0, 1.0, 1.0, 1.0]
        if numerical:
            val[2] = float(np.exp(rng.normal()))  # positive, long-tailed
        # FM score with ground-truth params
        x = np.zeros(n_feat)
        for k, vv in zip(idx, val):
            x[k] = vv
        vx = v.T @ x
        score = w @ x + 0.5 * (np.sum(vx**2) - np.sum((v.T**2) @ (x**2)))
        p = 1.0 / (1.0 + np.exp(-score))
        d.add(idx, val, float(rng.uniform() < p), user=u, timestamp=float(rng.uniform(0, 1e6)))
    return d
