"""Configuration tree with TOML load, validation, and hot reload.

Covers the reference's config/ (config.go:63-72 and the TOML schema): a
single Config with Database, Master, Server, Recommend (DataSource,
NonPersonalized, ItemToItem, UserToUser, Collaborative, Ranker, Fallback,
Replacement, External) and OpenAI sections. viper+mapstructure becomes
stdlib tomllib + dataclass mapping; hot reload is an mtime-watcher thread
with debounce (reference: fsnotify watch, master/master.go:174-268).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import logging
import threading
import time
import tomllib
from pathlib import Path
from typing import Callable

from .expression import FeedbackTypeExpression, parse_expressions

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DatabaseConfig:
    data_store: str = "memory://"
    cache_store: str = "memory://"
    blob_store: str = ""  # directory path; empty -> <workdir>/blobs
    meta_store: str = ":memory:"
    vector_store: str = ""  # empty -> CF served straight from the device index
    # vector quantization (reference: config/config.go:106-108 VectorConfig)
    vector_quantization_type: str = ""  # "" | "sq" | "pq" | "rq"
    vector_quantization_bits: int = 0


@dataclasses.dataclass
class MasterConfig:
    host: str = "127.0.0.1"
    port: int = 8086
    http_host: str = "127.0.0.1"
    http_port: int = 8088
    n_jobs: int = 1
    meta_timeout: float = 10.0
    dashboard_user_name: str = ""
    dashboard_password: str = ""
    admin_api_key: str = ""
    # mutual TLS for the gRPC control plane (reference: config/config.go:141-145)
    ssl_mode: bool = False
    ssl_ca: str = ""
    ssl_cert: str = ""
    ssl_key: str = ""


@dataclasses.dataclass
class ServerConfig:
    api_key: str = ""
    http_host: str = "127.0.0.1"
    http_port: int = 8087
    clock_error: float = 5.0
    epsilon: float = 0.0
    default_n: int = 10  # reference: config.go:160,502
    auto_insert_user: bool = True  # insert new users while inserting feedback
    auto_insert_item: bool = True  # insert new items while inserting feedback


@dataclasses.dataclass
class DataSourceConfig:
    positive_feedback_types: list[str] = dataclasses.field(default_factory=lambda: ["like"])
    read_feedback_types: list[str] = dataclasses.field(default_factory=lambda: ["read"])
    negative_feedback_types: list[str] = dataclasses.field(default_factory=list)
    positive_feedback_ttl: int = 0  # days; 0 = unlimited
    item_ttl: int = 0  # days

    def positive_exprs(self) -> list[FeedbackTypeExpression]:
        return parse_expressions(self.positive_feedback_types)


@dataclasses.dataclass
class NonPersonalizedConfigEntry:
    name: str
    score: str = "len(feedback)"
    filter: str = ""


@dataclasses.dataclass
class ItemToItemConfigEntry:
    name: str
    type: str = "auto"
    column: str = ""


@dataclasses.dataclass
class UserToUserConfigEntry:
    name: str
    type: str = "auto"
    column: str = ""


@dataclasses.dataclass
class CollaborativeConfig:
    type: str = "mf"  # none | mf (reference: config.go:340 — "none" disables CF)
    model_fit_period: float = 60.0  # minutes
    model_search_epoch: int = 10
    model_search_trials: int = 10
    enable_index: bool = True
    model: str = "bpr"  # bpr | als


@dataclasses.dataclass
class RankerConfig:
    type: str = "fm"  # none | fm | llm
    lift_threshold: float = 0.0
    model_fit_period: float = 60.0
    recommenders: list[str] = dataclasses.field(default_factory=lambda: ["collaborative"])
    prompt: str = ""


@dataclasses.dataclass
class FallbackConfig:
    recommenders: list[str] = dataclasses.field(default_factory=lambda: ["latest"])
    num_feedback_fallback_item_based: int = 10


@dataclasses.dataclass
class ReplacementConfig:
    enable_replacement: bool = False
    positive_replacement_decay: float = 0.8
    read_replacement_decay: float = 0.6


@dataclasses.dataclass
class ExternalConfigEntry:
    """Reference: config.ExternalConfig{Name, Script} (config/config.go:367-370).
    ``script`` is the reference's JavaScript hook, run by the embedded mini-JS
    interpreter; ``http``/``python`` are transport shortcuts."""

    name: str
    type: str = ""  # js | python | http; defaults to js when script is set
    url: str = ""
    script: str = ""
    timeout: float = 5.0

    def __post_init__(self) -> None:
        if not self.type:
            self.type = "js" if self.script else "python"

    def digest(self) -> str:
        return hashlib.md5(
            f"{self.name}|{self.type}|{self.url}|{self.script}".encode()
        ).hexdigest()


@dataclasses.dataclass
class SearchConfig:
    """Full-text item-search columns (reference: config.SearchConfig,
    config/config.go:264 — item expressions like item_id/comment/labels.title
    maintained by the data store's Reconcile)."""

    columns: list[str] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class RecommendConfig:
    cache_size: int = 100
    cache_expire: float = 72.0  # hours
    context_size: int = 10
    active_user_ttl: int = 0  # days; skip recomputation for inactive users
    data_source: DataSourceConfig = dataclasses.field(default_factory=DataSourceConfig)
    search: SearchConfig = dataclasses.field(default_factory=SearchConfig)
    non_personalized: list[NonPersonalizedConfigEntry] = dataclasses.field(default_factory=list)
    item_to_item: list[ItemToItemConfigEntry] = dataclasses.field(default_factory=list)
    user_to_user: list[UserToUserConfigEntry] = dataclasses.field(default_factory=list)
    collaborative: CollaborativeConfig = dataclasses.field(default_factory=CollaborativeConfig)
    ranker: RankerConfig = dataclasses.field(default_factory=RankerConfig)
    fallback: FallbackConfig = dataclasses.field(default_factory=FallbackConfig)
    replacement: ReplacementConfig = dataclasses.field(default_factory=ReplacementConfig)
    external: list[ExternalConfigEntry] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class OpenAIConfig:
    base_url: str = ""
    auth_token: str = ""
    chat_completion_model: str = ""
    embedding_model: str = ""
    embedding_dimensions: int = 0
    chat_completion_rpm: int = 60
    chat_completion_tpm: int = 100000
    embedding_rpm: int = 600
    embedding_tpm: int = 1000000
    log_file: str = ""


@dataclasses.dataclass
class TracingConfig:
    enable: bool = False
    exporter: str = "jaeger"
    sampler: str = "always"
    ratio: float = 1.0
    collector_endpoint: str = ""


@dataclasses.dataclass
class OIDCConfig:
    """Dashboard single sign-on (reference: config/config.go:415-421)."""

    enable: bool = False
    issuer: str = ""
    client_id: str = ""
    client_secret: str = ""
    redirect_url: str = ""


@dataclasses.dataclass
class Config:
    database: DatabaseConfig = dataclasses.field(default_factory=DatabaseConfig)
    master: MasterConfig = dataclasses.field(default_factory=MasterConfig)
    server: ServerConfig = dataclasses.field(default_factory=ServerConfig)
    recommend: RecommendConfig = dataclasses.field(default_factory=RecommendConfig)
    openai: OpenAIConfig = dataclasses.field(default_factory=OpenAIConfig)
    tracing: TracingConfig = dataclasses.field(default_factory=TracingConfig)
    oidc: OIDCConfig = dataclasses.field(default_factory=OIDCConfig)

    # ------------------------------------------------------------ validation

    def validate(self) -> None:
        """Strict validation (reference: go-playground validators + custom
        data_store/item_expr checks)."""
        for url, kinds in (
            (self.database.data_store,
             ("memory://", "sqlite://", "proxy://", "none://", "mysql://",
              "postgres://", "postgresql://", "clickhouse://", "mongodb://")),
            (self.database.cache_store,
             ("memory://", "sqlite://", "proxy://", "redis://", "none://",
              "mysql://", "postgres://", "postgresql://", "mongodb://")),
            (self.database.vector_store,
             ("memory://", "sqlite://", "proxy://", "none://", "hnsw://",
              "qdrant://", "weaviate://", "milvus://")),
        ):
            if url and not any(url.startswith(k) or url == k.rstrip("://") for k in kinds):
                raise ValueError(f"unsupported store URL {url!r}")
        if self.database.vector_quantization_type not in ("", "sq", "pq", "rq"):
            raise ValueError(
                f"unsupported vector quantization {self.database.vector_quantization_type!r}"
            )
        for spec in (
            self.recommend.data_source.positive_feedback_types
            + self.recommend.data_source.read_feedback_types
            + self.recommend.data_source.negative_feedback_types
        ):
            FeedbackTypeExpression.parse(spec)  # raises on invalid
        if self.recommend.ranker.type not in ("none", "fm", "llm"):
            raise ValueError(f"invalid ranker type {self.recommend.ranker.type!r}")
        if self.recommend.collaborative.model not in ("bpr", "als"):
            raise ValueError(f"invalid collaborative model {self.recommend.collaborative.model!r}")
        if self.recommend.collaborative.type not in ("none", "mf"):
            raise ValueError(f"invalid collaborative type {self.recommend.collaborative.type!r}")
        from .safe_expr import SafeExpression

        for np_cfg in self.recommend.non_personalized:
            SafeExpression(np_cfg.score)
            if np_cfg.filter:
                SafeExpression(np_cfg.filter)
        for i2i in self.recommend.item_to_item:
            if i2i.type not in ("embedding", "tags", "users", "auto", "chat"):
                raise ValueError(f"invalid item-to-item type {i2i.type!r}")
        for u2u in self.recommend.user_to_user:
            if u2u.type not in ("embedding", "tags", "items", "auto"):
                raise ValueError(f"invalid user-to-user type {u2u.type!r}")

    # -------------------------------------------------------------- digests

    def offline_recommend_digest(self) -> str:
        """Digest of everything that invalidates offline recommendations
        (reference: config OfflineRecommendDigest :204-236)."""
        payload = json.dumps(
            dataclasses.asdict(self.recommend), sort_keys=True, default=str
        )
        return hashlib.md5(payload.encode()).hexdigest()

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), default=str)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return _from_dict(cls, json.loads(s))


def _from_dict(cls, d: dict):
    """Recursively map a plain dict onto nested dataclasses, tolerating
    unknown keys (forward compatibility, like mapstructure)."""
    if not dataclasses.is_dataclass(cls):
        return d
    import typing

    hints = typing.get_type_hints(cls)
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for name, f in fields.items():
        if name not in d:
            continue
        v = d[name]
        ftype = hints.get(name, f.type)
        if isinstance(ftype, type) and dataclasses.is_dataclass(ftype):
            kwargs[name] = _from_dict(ftype, v)
        elif name in (
            "non_personalized", "item_to_item", "user_to_user", "external"
        ) and isinstance(v, list):
            elem_cls = {
                "non_personalized": NonPersonalizedConfigEntry,
                "item_to_item": ItemToItemConfigEntry,
                "user_to_user": UserToUserConfigEntry,
                "external": ExternalConfigEntry,
            }[name]
            kwargs[name] = [_from_dict(elem_cls, e) for e in v]
        else:
            kwargs[name] = v
    return cls(**kwargs)


def load_config(path: str | Path) -> Config:
    """Load + validate a TOML config file (reference: config.LoadConfig)."""
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    cfg = _from_dict(Config, raw)
    cfg.validate()
    return cfg


class ConfigWatcher:
    """Hot reload: watch the file's mtime with a debounce and invoke
    callbacks with the re-validated config (reference: fsnotify watcher with
    1s debounce, master/master.go:174-268)."""

    def __init__(self, path: str | Path, on_change: Callable[[Config], None], interval: float = 1.0) -> None:
        self.path = Path(path)
        self.on_change = on_change
        self.interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._mtime = self.path.stat().st_mtime if self.path.exists() else 0.0

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            try:
                mtime = self.path.stat().st_mtime
            except FileNotFoundError:
                continue
            if mtime != self._mtime:
                self._mtime = mtime
                time.sleep(0.2)  # debounce partial writes
                try:
                    cfg = load_config(self.path)
                except Exception as e:
                    logger.error("config reload failed: %s", e)
                    continue
                logger.info("config reloaded from %s", self.path)
                self.on_change(cfg)

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)
