"""Non-personalized recommenders: config-defined score/filter expressions.

Covers the reference's logics/non_personalized.go: each configured
recommender evaluates a score expression per item over the item's feedback,
optionally filtered, and keeps top-n per category. The reference pushes into
per-category heaps; here items are scored in one pass and ranked with
numpy (the data volumes are host-side catalog metadata, not tensors).
"""

from __future__ import annotations

import dataclasses
import heapq
import time

from ..storage.types import Feedback, Item, Score
from ..utils.safe_expr import SafeExpression


@dataclasses.dataclass
class NonPersonalizedConfig:
    """Mirror of config.NonPersonalizedConfig: name + score/filter exprs.

    Expressions are the Python dialect (utils/safe_expr.py) with variables
    ``item`` (Item) and ``feedback`` (list[Feedback]), e.g.
    score="len(feedback)" (most popular), score="item.timestamp" (trending by
    recency), filter="not item.is_hidden".
    """

    name: str
    score: str = "len(feedback)"
    filter: str = ""

    def digest(self) -> str:
        import hashlib

        return hashlib.md5(f"{self.name}|{self.score}|{self.filter}".encode()).hexdigest()


class NonPersonalized:
    """Reference: logics/non_personalized.go:35-176."""

    def __init__(self, cfg: NonPersonalizedConfig, n: int, timestamp: float | None = None) -> None:
        self.name = cfg.name
        self.cfg = cfg
        self.n = n
        self.timestamp = timestamp if timestamp is not None else time.time()
        self._score_fn = SafeExpression(cfg.score)
        self._filter_fn = SafeExpression(cfg.filter) if cfg.filter else None
        # per-category heaps of (score, seq, item_id); "" = overall
        self._heaps: dict[str, list] = {"": []}
        self._seq = 0

    def push(self, item: Item, feedback: list[Feedback]) -> None:
        if item.is_hidden:
            return
        if self._filter_fn is not None:
            if not bool(self._filter_fn(item=item, feedback=feedback)):
                return
        score = float(self._score_fn(item=item, feedback=feedback))
        self._seq += 1
        for category in [""] + list(item.categories):
            h = self._heaps.setdefault(category, [])
            heapq.heappush(h, (score, self._seq, item.item_id))
            if len(h) > self.n:
                heapq.heappop(h)

    def pop_all(self) -> list[Score]:
        """Merge per-category heaps into deduped Scores with category lists,
        sorted by score descending (reference: PopAll :142-170)."""
        merged: dict[str, Score] = {}
        for category, h in self._heaps.items():
            for score, _, item_id in h:
                if item_id not in merged:
                    merged[item_id] = Score(
                        id=item_id, score=score, categories=[category], timestamp=self.timestamp
                    )
                else:
                    merged[item_id].categories.append(category)
        out = list(merged.values())
        out.sort(key=lambda s: -s.score)
        return out
