"""External recommenders.

Covers the reference's logics/external.go (:29-101), which runs user-supplied
JavaScript in a QuickJS VM with an injected ``fetch``. QuickJS is not in this
image; the same capability is provided two ways:

- ``type = "http"``: pull item ids from an HTTP endpoint
  (``GET <url>?user_id=...`` returning a JSON array of item ids) — covers the
  dominant real use of the JS hook (calling out to an external service);
- ``type = "python"``: a registered Python callable ``(user_id) -> [item_id]``
  for in-process extensions.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import urllib.parse
import urllib.request
from typing import Callable

_REGISTRY: dict[str, Callable[[str], list[str]]] = {}


def register_external(name: str, fn: Callable[[str], list[str]]) -> None:
    """Register an in-process external recommender callable."""
    _REGISTRY[name] = fn


@dataclasses.dataclass
class ExternalConfig:
    """Mirror of config.ExternalConfig."""

    name: str
    type: str = "python"  # python | http
    url: str = ""
    timeout: float = 5.0

    def digest(self) -> str:
        return hashlib.md5(f"{self.name}|{self.type}|{self.url}".encode()).hexdigest()


class External:
    def __init__(self, cfg: ExternalConfig) -> None:
        self.cfg = cfg

    def pull(self, user_id: str) -> list[str]:
        if self.cfg.type == "python":
            fn = _REGISTRY.get(self.cfg.name)
            if fn is None:
                return []
            out = fn(user_id)
            return [str(i) for i in out]
        if self.cfg.type == "http":
            q = urllib.parse.urlencode({"user_id": user_id})
            url = f"{self.cfg.url}?{q}" if "?" not in self.cfg.url else f"{self.cfg.url}&{q}"
            try:
                with urllib.request.urlopen(url, timeout=self.cfg.timeout) as resp:
                    data = json.loads(resp.read().decode())
            except Exception:
                return []
            if isinstance(data, list):
                return [str(i) for i in data]
            return []
        raise ValueError(f"unknown external type {self.cfg.type!r}")


def get_external(cfg: ExternalConfig) -> External:
    return External(cfg)
