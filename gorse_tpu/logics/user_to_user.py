"""User-to-user similarity recommenders.

Covers the reference's logics/user_to_user.go (:49-287): the same four
similarity types as item-to-item with roles swapped — ``embedding`` (user
embedding vectors), ``tags`` (user label sets), ``items`` (co-consumed item
sets, IDF-weighted by item popularity), ``auto`` (tags+items averaged).
Computed as one batched device pass over all users (ops/similarity.py).
"""

from __future__ import annotations

import dataclasses
import hashlib
import time

import numpy as np

from ..storage.types import Score, User
from .item_to_item import (
    AutoItemToItem,
    EmbeddingItemToItem,
    ItemToItemConfig,
    TagsItemToItem,
    UsersItemToItem,
)


@dataclasses.dataclass
class UserToUserConfig:
    """Mirror of config.UserToUserConfig."""

    name: str
    type: str = "auto"  # embedding | tags | items | auto
    column: str = ""

    def digest(self) -> str:
        return hashlib.md5(f"{self.name}|{self.type}|{self.column}".encode()).hexdigest()


class _UserShim:
    """Adapts User entities to the item-to-item engines (same math,
    different entity type)."""

    def __init__(self, user: User) -> None:
        self.item_id = user.user_id
        self.categories: list[str] = []
        self.labels = user.labels
        self.is_hidden = False


def _to_i2i_cfg(cfg: UserToUserConfig) -> ItemToItemConfig:
    column = cfg.column.replace("user.Labels", "item.Labels").replace("user.", "item.")
    mapped_type = {"items": "users"}.get(cfg.type, cfg.type)
    return ItemToItemConfig(name=cfg.name, type=mapped_type, column=column)


class UserToUser:
    """Facade matching the reference's UserToUser interface: push users with
    their feedback (consumed item ids), pop per-user neighbor lists."""

    def __init__(
        self,
        cfg: UserToUserConfig,
        n: int,
        timestamp: float | None = None,
        tag_idf: np.ndarray | None = None,
        item_idf: np.ndarray | None = None,
        label_index=None,
    ) -> None:
        self.cfg = cfg
        self.name = cfg.name
        icfg = _to_i2i_cfg(cfg)
        ts = timestamp if timestamp is not None else time.time()
        if cfg.type == "embedding":
            self._engine = EmbeddingItemToItem(icfg, n, ts)
        elif cfg.type == "tags":
            self._engine = TagsItemToItem(icfg, n, ts, idf=tag_idf, label_index=label_index)
        elif cfg.type == "items":
            # co-consumed item sets, IDF-weighted by item popularity —
            # UsersItemToItem's push already takes the set directly
            self._engine = UsersItemToItem(icfg, n, ts, user_idf=item_idf)
        elif cfg.type == "auto":
            self._engine = AutoItemToItem(icfg, n, ts, tag_idf=tag_idf, user_idf=item_idf, label_index=label_index)
        else:
            raise ValueError(f"unknown user-to-user type {cfg.type!r}")

    def push(self, user: User, feedback: list[int]) -> None:
        self._engine.push(_UserShim(user), feedback)

    def pop_all(self) -> list[tuple[str, list[Score]]]:
        return self._engine.pop_all()
