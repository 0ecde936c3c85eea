"""Master node: the periodic training loop.

Covers the reference's master/ package: load the dataset from the data
store, refresh non-personalized / item-to-item / user-to-user caches, train
the CF model, build the serving index, train the CTR ranker, upload
artifacts to the blob store, record metadata, collect garbage, and
optionally run hyper-parameter search (task sequence master/tasks.go:229-271).

The gRPC meta service of the reference (GetMeta/PushProgress) maps to
``get_meta`` here, served over HTTP by the in-one/master REST endpoint;
workers and servers poll it for config + model ids + peer lists.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import threading
import time

import numpy as np

from ..data.ctr import CTRDataset
from ..data.dataset import Dataset
from ..logics.cf import MatrixFactorizationIndex
from ..logics.item_to_item import ItemToItemConfig, new_item_to_item
from ..logics.non_personalized import NonPersonalized, NonPersonalizedConfig
from ..logics.user_to_user import UserToUser, UserToUserConfig
from ..models import FitConfig, Params, create_mf_model
from ..models.fm import AFM
from ..models.optimize import ALS_SPACE, BPR_SPACE, model_search, model_type_search
from ..storage import cache as ck
from ..storage.blob import BlobStore
from ..storage.cache import CacheStore, key
from ..storage.data import DataStore
from ..storage.meta import (
    CLICK_THROUGH_RATE_MODEL,
    COLLABORATIVE_FILTERING_MODEL,
    MetaStore,
)
from ..storage.types import TimeSeriesPoint
from ..utils.config import Config
from ..utils.expression import match_any
from .progress import ProgressTracker

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class LoadedData:
    """Result of the load-dataset task (reference: master/tasks.go:51-227)."""

    dataset: Dataset
    train: Dataset
    test: Dataset
    ctr: CTRDataset | None
    item_categories: list[list[str]]
    items: list
    # load-start snapshot time; cache GC uses it as the deletion cutoff so
    # rows written for entities created after the snapshot survive
    # (reference: dataset.GetTimestamp() as Before, master/tasks.go:1273-1296)
    timestamp: float = 0.0


class Master:
    """Reference: master.Master (master/master.go:72-112)."""

    def __init__(
        self,
        config: Config,
        data_store: DataStore,
        cache_store: CacheStore,
        blob_store: BlobStore,
        meta_store: MetaStore,
        vector_store=None,
    ) -> None:
        self.config = config
        self.data = data_store
        self.cache = cache_store
        self.blob = blob_store
        self.meta = meta_store
        self.vectors = vector_store
        self.progress = ProgressTracker()
        # Prometheus metric names match the reference's exactly
        # (gorse_master_*, master/metrics.go:33-215) so existing dashboards
        # keep working after migration
        from .metrics import MetricsRegistry

        self.metrics = MetricsRegistry(namespace="gorse")
        self.cf_model = None
        self.cf_index: MatrixFactorizationIndex | None = None
        self.ctr_model: AFM | None = None
        self._stop = threading.Event()
        self._trigger = threading.Event()
        self._thread: threading.Thread | None = None
        self._last_optimize: dict[str, float] = {}
        self._mesh = None
        self._mesh_built = False
        self._load_models_from_meta()

    def training_mesh(self):
        """Mesh over all local devices for sharded training, or None when a
        single device is present (the reference trains single-node,
        README.md:67; multi-chip sharded training is this build's
        distributed-training axis, SURVEY.md §2.7)."""
        if not self._mesh_built:
            self._mesh_built = True
            import jax

            devices = jax.devices()
            if len(devices) > 1:
                from ..parallel import make_mesh

                self._mesh = make_mesh(len(devices), devices=devices)
        return self._mesh

    # ----------------------------------------------------------- meta + rpc

    def get_meta(self) -> dict:
        """The GetMeta payload (reference: master/rpc.go:29-79): full config
        JSON, active model ids, peer lists."""
        servers = [n.uuid for n in self.meta.list_nodes("server")]
        workers = [n.uuid for n in self.meta.list_nodes("worker")]
        config_json = self.config.to_json()
        # When this master proxies its node-local stores over gRPC, hand
        # other nodes proxy:// URLs instead of paths only valid on this host
        # (reference: worker/worker.go:164-223, server/server.go:177-226
        # select the master's storage proxy for local engines).
        target = getattr(self, "grpc_proxy_target", None)
        if target:
            cfg = json.loads(config_json)
            db = cfg.get("database", {})
            for store_key in ("data_store", "cache_store"):
                url = db.get(store_key, "")
                if url.startswith(("memory://", "sqlite://")) or url in ("memory", "sqlite"):
                    db[store_key] = f"proxy://{target}"
            config_json = json.dumps(cfg)
        return {
            "config": config_json,
            "cf_model_id": self.meta.get(COLLABORATIVE_FILTERING_MODEL) or "",
            "ctr_model_id": self.meta.get(CLICK_THROUGH_RATE_MODEL) or "",
            "servers": servers,
            "workers": workers,
        }

    def _load_models_from_meta(self) -> None:
        """Resume serving the last trained models after restart
        (reference: master/master.go:331-359), plus any dashboard
        recommend-config override persisted in the meta store (reference:
        RECOMMEND_CONFIG applied over the file config, master/master.go:160-172)."""
        from ..storage.meta import RECOMMEND_CONFIG

        raw_override = self.meta.get(RECOMMEND_CONFIG)
        if raw_override:
            try:
                override = json.loads(raw_override)
                merged = json.loads(self.config.to_json())
                merged["recommend"].update(override.get("recommend", override))
                new_cfg = Config.from_json(json.dumps(merged))
                new_cfg.validate()
                self.config.recommend = new_cfg.recommend
                logger.info("applied persisted recommend-config override")
            except Exception as e:  # noqa: BLE001 — a bad override must not block startup
                logger.warning("ignoring invalid RECOMMEND_CONFIG override: %s", e)
        cf_id = self.meta.get(COLLABORATIVE_FILTERING_MODEL)
        if cf_id and self.blob.exists(cf_id):
            try:
                self.cf_index = MatrixFactorizationIndex.load(self.blob.open(cf_id))
                logger.info("resumed CF index %s", cf_id)
            except Exception as e:  # noqa: BLE001
                logger.warning("failed to resume CF model %s: %s", cf_id, e)
        ctr_id = self.meta.get(CLICK_THROUGH_RATE_MODEL)
        if ctr_id and self.blob.exists(ctr_id):
            try:
                self.ctr_model = AFM.load(self.blob.open(ctr_id))
                logger.info("resumed CTR model %s", ctr_id)
            except Exception as e:  # noqa: BLE001
                logger.warning("failed to resume CTR model %s: %s", ctr_id, e)

    # ---------------------------------------------------------------- tasks

    def load_dataset(self) -> LoadedData:
        """Reference: LoadDataFromDatabase master/tasks.go:274-740 — stream
        users/items/feedback from the data store into the training dataset +
        the CTR dataset."""
        with self.progress.span("load_dataset"):
            cfg = self.config.recommend
            # async search-column maintenance (reference: the detached
            # DataClient.Reconcile at load start, master/tasks.go:56-65)
            if not getattr(self, "_reconciling", False):
                self._reconciling = True

                def _reconcile():
                    try:
                        self.data.reconcile(cfg.search.columns)
                    except Exception:  # noqa: BLE001
                        logger.exception("failed to reconcile data store")
                    finally:
                        self._reconciling = False

                threading.Thread(target=_reconcile, daemon=True).start()
            t_task = time.perf_counter()
            load_time = time.time()
            step_seconds = self.metrics.gauge_set
            dataset = Dataset()
            t0 = time.perf_counter()
            items = list(self.data.get_items())
            item_categories = []
            for item in items:
                from ..logics.item_to_item import _flatten_labels

                dataset.add_item(item.item_id, labels=_flatten_labels(item.labels))
                item_categories.append(item.categories)
            step_seconds(
                "master_load_dataset_step_seconds",
                time.perf_counter() - t0, labels={"step": "load_items"},
            )
            t0 = time.perf_counter()
            users = list(self.data.get_users())
            for user in users:
                from ..logics.item_to_item import _flatten_labels

                dataset.add_user(user.user_id, labels=_flatten_labels(user.labels))
            step_seconds(
                "master_load_dataset_step_seconds",
                time.perf_counter() - t0, labels={"step": "load_users"},
            )
            positive_ttl = cfg.data_source.positive_feedback_ttl
            cutoff = time.time() - positive_ttl * 86400 if positive_ttl > 0 else None
            positive_edges: set[tuple[str, str]] = set()
            negative_edges: list[tuple[str, str]] = []
            t0 = time.perf_counter()
            n_feedback_rows = n_implicit = n_total_pos = 0
            active_users: set[str] = set()
            active_items: set[str] = set()
            for fb in self.data.get_feedback(end_time=time.time()):
                n_feedback_rows += 1
                if match_any(cfg.data_source.positive_feedback_types, fb.feedback_type, fb.value):
                    n_total_pos += 1  # pre-TTL, pre-dedup (NumTotalPosFeedbacks)
                    active_users.add(fb.user_id)
                    active_items.add(fb.item_id)
                    if cutoff is not None and fb.timestamp < cutoff:
                        continue
                    if (fb.user_id, fb.item_id) not in positive_edges:
                        positive_edges.add((fb.user_id, fb.item_id))
                        dataset.add_feedback(fb.user_id, fb.item_id, fb.timestamp)
                elif match_any(cfg.data_source.negative_feedback_types, fb.feedback_type, fb.value):
                    negative_edges.append((fb.user_id, fb.item_id))
                else:
                    n_implicit += 1
            step_seconds(
                "master_load_dataset_step_seconds",
                time.perf_counter() - t0, labels={"step": "load_positive_feedback"},
            )
            t0 = time.perf_counter()
            train, test = dataset.split_cf(seed=0)
            step_seconds(
                "master_load_dataset_step_seconds",
                time.perf_counter() - t0, labels={"step": "split_ranking_dataset"},
            )
            t0 = time.perf_counter()
            ctr = self._build_ctr_dataset(dataset, positive_edges, negative_edges)
            step_seconds(
                "master_load_dataset_step_seconds",
                time.perf_counter() - t0, labels={"step": "create_ranking_dataset"},
            )
            step_seconds("master_load_dataset_total_seconds", time.perf_counter() - t_task)
            # catalog gauges (reference: master/metrics.go:151-215, set at
            # the end of LoadDataFromDatabase master/tasks.go:313-437)
            g = self.metrics.gauge_set
            g("master_users_total", dataset.count_users())
            g("master_items_total", dataset.count_items())
            g("master_user_labels_total", len(dataset.user_label_dict))
            g("master_item_labels_total", len(dataset.item_label_dict))
            g("master_feedbacks_total", n_feedback_rows)
            g("master_positive_feedbacks_total", len(positive_edges))
            g("master_negative_feedbacks_total", len(negative_edges))
            g("master_implicit_feedbacks_total", n_implicit)
            g("master_active_users_total", len(active_users))
            g("master_inactive_users_total", max(len(users) - len(active_users), 0))
            g("master_active_items_total", len(active_items))
            g("master_inactive_items_total", max(len(items) - len(active_items), 0))
            # global-meta KV + statistics time series under the reference's
            # names (master/tasks.go:127-142, storage/cache/database.go:54-65)
            # — getStats and the dashboard charts read these
            for kv, value in (
                (ck.NUM_USERS, dataset.count_users()),
                (ck.NUM_ITEMS, dataset.count_items()),
                (ck.NUM_USER_LABELS, len(dataset.user_label_dict)),
                (ck.NUM_ITEM_LABELS, len(dataset.item_label_dict)),
                (ck.NUM_TOTAL_POS_FEEDBACKS, n_total_pos),
                (ck.NUM_VALID_POS_FEEDBACKS, len(positive_edges)),
                (ck.NUM_VALID_NEG_FEEDBACKS, len(negative_edges)),
            ):
                self.cache.set(key(ck.GLOBAL_META, kv), str(int(value)))
            self._record_ts(ck.NUM_USERS, dataset.count_users())
            self._record_ts(ck.NUM_ITEMS, dataset.count_items())
            # real ingested rows only — the CTR dataset's sampled balancing
            # negatives would make this chart fluctuate with the sampler
            self._record_ts(ck.NUM_FEEDBACK, dataset.count_feedback() + len(negative_edges))
            self._record_ts(ck.NUM_POS_FEEDBACKS, dataset.count_feedback())
            self._record_ts(ck.NUM_NEG_FEEDBACKS, len(negative_edges))
            return LoadedData(
                dataset, train, test, ctr, item_categories, items, timestamp=load_time
            )

    def _build_ctr_dataset(self, dataset: Dataset, positive_edges, negative_edges) -> CTRDataset:
        """CTR rows from positive + explicit/sampled negatives
        (reference: master/tasks.go:668-739 STEP6)."""
        from ..data.unified_index import UnifiedIndex

        index = UnifiedIndex(
            users=dataset.user_dict,
            items=dataset.item_dict,
            user_labels=dataset.user_label_dict,
            item_labels=dataset.item_label_dict,
        )
        ctr = CTRDataset(index)
        # hot loop over every edge: hoist the lookups and build each row once
        u_num = dataset.user_dict.to_number
        i_num = dataset.item_dict.to_number
        item_off = index.item_offset
        ul_off, il_off = index.user_label_offset, index.item_label_offset
        user_labels, item_labels = dataset.user_labels, dataset.item_labels
        n_ul, n_il = len(user_labels), len(item_labels)

        def add_row(user_id: str, item_id: str, target: float) -> None:
            u = u_num(user_id)
            i = i_num(item_id)
            if u < 0 or i < 0:
                return
            idx = [u, item_off + i]
            val = [1.0, 1.0]
            if u < n_ul:
                for l in user_labels[u]:
                    idx.append(ul_off + l)
                    val.append(1.0)
            if i < n_il:
                for l in item_labels[i]:
                    idx.append(il_off + l)
                    val.append(1.0)
            ctr.add(idx, val, target, user=u)

        for user_id, item_id in positive_edges:
            add_row(user_id, item_id, 1.0)
        for user_id, item_id in negative_edges:
            add_row(user_id, item_id, 0.0)
        # sample extra negatives to balance if explicit negatives are scarce
        n_missing = len(positive_edges) - len(negative_edges)
        if n_missing > 0 and dataset.count_items() > 1:
            rng = np.random.default_rng(0)
            pos_set = set(map(tuple, positive_edges))  # O(1) membership —
            # a list scan here is O(edges) per sample, O(edges^2) overall
            users = list({u for u, _ in positive_edges})
            for _ in range(n_missing):
                user_id = users[int(rng.integers(len(users)))]
                item_idx = int(rng.integers(dataset.count_items()))
                item_id = dataset.item_dict.to_name(item_idx)
                if (user_id, item_id) not in pos_set:
                    add_row(user_id, item_id, 0.0)
        return ctr

    def update_non_personalized(self, data: LoadedData) -> None:
        """Reference: master/tasks.go non-personalized refresh (:69-76 +
        updateNonPersonalized). Incremental via config digests."""
        entries = list(self.config.recommend.non_personalized)
        if not any(e.name == "popular" for e in entries):
            # built-in most-popular (reference registers `popular` by default)
            from ..utils.config import NonPersonalizedConfigEntry

            entries.append(NonPersonalizedConfigEntry(name="popular", score="len(feedback)"))
        if not any(e.name == "latest" for e in entries):
            from ..utils.config import NonPersonalizedConfigEntry

            entries.append(NonPersonalizedConfigEntry(name="latest", score="item.timestamp"))
        for entry in entries:
            cfg = NonPersonalizedConfig(name=entry.name, score=entry.score, filter=entry.filter)
            digest_key = key(ck.NON_PERSONALIZED_DIGEST, entry.name)
            if self.cache.get(digest_key) == cfg.digest() and not self._data_changed():
                continue
            with self.progress.span(f"non_personalized/{entry.name}"):
                engine = NonPersonalized(cfg, self.config.recommend.cache_size)
                for item in data.items:
                    fb = self.data.get_item_feedback(item.item_id)
                    engine.push(item, fb)
                self.cache.delete_scores(ck.NON_PERSONALIZED, [entry.name])
                self.cache.add_scores(ck.NON_PERSONALIZED, entry.name, engine.pop_all())
                self.cache.set(digest_key, cfg.digest())
                self.cache.set(key(ck.NON_PERSONALIZED_UPDATE_TIME, entry.name), str(time.time()))
                # global update-time stamps surfaced by getStats
                # (reference: LastUpdate{Popular,Latest}ItemsTime,
                # storage/cache/database.go:67-68)
                if entry.name == "popular":
                    self.cache.set(
                        key(ck.GLOBAL_META, ck.LAST_UPDATE_POPULAR_ITEMS_TIME), str(time.time())
                    )
                elif entry.name == "latest":
                    self.cache.set(
                        key(ck.GLOBAL_META, ck.LAST_UPDATE_LATEST_ITEMS_TIME), str(time.time())
                    )

    def _data_changed(self) -> bool:
        return True  # incremental data-digest optimization arrives with events

    def _needs_refresh(self, digest_key: str, update_key: str, digest: str) -> bool:
        """Incremental gating: recompute when the config digest changed or
        the refresh period elapsed. The digest includes the entity count, so
        inserted items/users force a refresh on the next cycle — the batched
        analog of the reference's per-item gate (needUpdateItemToItem
        master/tasks.go:824-857; one batched device pass computes every
        item's neighbors at once, so gating is per entry + corpus, not per
        item)."""
        if self.cache.get(digest_key) != digest:
            return True
        last = float(self.cache.get(update_key) or 0)
        period_s = self.config.recommend.cache_expire * 3600.0
        return (time.time() - last) > period_s

    def update_item_to_item(self, data: LoadedData) -> None:
        """Reference: updateItemToItem master/tasks.go:742-857."""
        entries = list(self.config.recommend.item_to_item)
        if not entries:
            return
        tag_idf = user_idf = None
        for entry in entries:
            cfg = ItemToItemConfig(
                name=entry.name, type=entry.type, column=entry.column,
                prompt=getattr(entry, "prompt", ""),
            )
            corpus_digest = f"{cfg.digest()}|{data.dataset.count_items()}|{data.dataset.count_feedback()}"
            if not self._needs_refresh(
                key(ck.ITEM_TO_ITEM_DIGEST, entry.name, "_config"),
                key(ck.ITEM_TO_ITEM_UPDATE_TIME, entry.name),
                corpus_digest,
            ):
                continue
            if tag_idf is None:
                tag_idf = data.dataset.item_label_idf()
                user_idf = data.dataset.user_idf()
            with self.progress.span(f"item_to_item/{entry.name}"):
                t0 = time.perf_counter()
                engine = new_item_to_item(
                    cfg, self.config.recommend.cache_size,
                    tag_idf=tag_idf, user_idf=user_idf,
                    label_index=data.dataset.item_label_dict,
                )
                for idx, item in enumerate(data.items):
                    item_index = data.dataset.item_dict.to_number(item.item_id)
                    feedback = (
                        data.dataset.item_feedback[item_index]
                        if 0 <= item_index < len(data.dataset.item_feedback)
                        else []
                    )
                    engine.push(item, feedback)
                n_updated = 0
                for item_id, scores in engine.pop_all():
                    self.cache.add_scores(ck.ITEM_TO_ITEM, key(entry.name, item_id), scores)
                    self.cache.set(
                        key(ck.ITEM_TO_ITEM_DIGEST, entry.name, item_id), cfg.digest()
                    )
                    n_updated += 1
                self.cache.set(key(ck.ITEM_TO_ITEM_DIGEST, entry.name, "_config"), corpus_digest)
                self.cache.set(key(ck.ITEM_TO_ITEM_UPDATE_TIME, entry.name), str(time.time()))
                # reference: FindItemNeighborsTotalSeconds +
                # UpdateItemNeighborsTotal, master/metrics.go:55-72
                self.metrics.gauge_set(
                    "master_find_item_neighbors_total_seconds", time.perf_counter() - t0
                )
                self.metrics.gauge_set("master_update_item_neighbors_total", n_updated)

    def update_user_to_user(self, data: LoadedData) -> None:
        """Reference: updateUserToUser master/tasks.go:859-961."""
        entries = list(self.config.recommend.user_to_user)
        if not entries:
            return
        item_idf = tag_idf = users = None
        for entry in entries:
            cfg = UserToUserConfig(name=entry.name, type=entry.type, column=entry.column)
            corpus_digest = f"{cfg.digest()}|{data.dataset.count_users()}|{data.dataset.count_feedback()}"
            if not self._needs_refresh(
                key(ck.USER_TO_USER_DIGEST, entry.name, "_config"),
                key(ck.USER_TO_USER_UPDATE_TIME, entry.name),
                corpus_digest,
            ):
                continue
            if users is None:
                item_idf = data.dataset.item_idf()
                tag_idf = data.dataset.user_label_idf()
                users = list(self.data.get_users())
            with self.progress.span(f"user_to_user/{entry.name}"):
                t0 = time.perf_counter()
                engine = UserToUser(
                    cfg, self.config.recommend.cache_size,
                    tag_idf=tag_idf, item_idf=item_idf,
                    label_index=data.dataset.user_label_dict,
                )
                for user in users:
                    user_index = data.dataset.user_dict.to_number(user.user_id)
                    feedback = (
                        data.dataset.user_feedback[user_index]
                        if 0 <= user_index < len(data.dataset.user_feedback)
                        else []
                    )
                    engine.push(user, feedback)
                n_updated = 0
                for user_id, scores in engine.pop_all():
                    self.cache.add_scores(ck.USER_TO_USER, key(entry.name, user_id), scores)
                    self.cache.set(
                        key(ck.USER_TO_USER_DIGEST, entry.name, user_id), cfg.digest()
                    )
                    n_updated += 1
                self.cache.set(key(ck.USER_TO_USER_DIGEST, entry.name, "_config"), corpus_digest)
                self.cache.set(key(ck.USER_TO_USER_UPDATE_TIME, entry.name), str(time.time()))
                self.metrics.gauge_set(
                    "master_find_user_neighbors_total_seconds", time.perf_counter() - t0
                )
                self.metrics.gauge_set("master_update_user_neighbors_total", n_updated)

    def train_collaborative_filtering(self, data: LoadedData) -> None:
        """Reference: trainCollaborativeFiltering master/tasks.go:963-1109."""
        cfg = self.config.recommend.collaborative
        if cfg.type.lower() == "none":
            logger.info("skip CF training: collaborative.type = none")
            return
        if data.train.count_feedback() == 0:
            logger.info("skip CF training: no feedback")
            return
        with self.progress.span("fit_cf_model"):
            # current model meta vs hyper-search target: adopt the searched
            # (type, params) only when its score beats the current model's
            # (reference: master/tasks.go:984-996)
            current = json.loads(self.meta.get("CF_MODEL_META") or "null") or {
                "type": cfg.model, "params": self.meta_model_params("cf"), "score": -1.0,
            }
            target = json.loads(self.meta.get("CF_SEARCH_TARGET") or "null")
            mtype, mparams = current["type"], dict(current["params"])
            if target and target["score"] > current.get("score", -1.0) and (
                target["type"] != mtype or target["params"] != mparams
            ):
                mtype, mparams = target["type"], dict(target["params"])
                logger.info(
                    "find better collaborative filtering model: type=%s score=%.4f params=%s",
                    mtype, target["score"], mparams,
                )
            params = Params(mparams)
            if cfg.fit_epoch > 0:
                params = Params({"n_epochs": cfg.fit_epoch}).merged(params)
            model = create_mf_model(mtype, params)
            t0 = time.perf_counter()
            score = model.fit(
                data.train, data.test,
                FitConfig(
                    verbose=10, patience=cfg.early_stopping.patience, seed=0,
                    mesh=self.training_mesh(),
                ),
            )
            # reference: CollaborativeFilteringFitSeconds + model-quality
            # gauges, master/metrics.go:90-118
            g = self.metrics.gauge_set
            g("master_collaborative_filtering_fit_seconds", time.perf_counter() - t0)
            g("master_collaborative_filtering_ndcg_10", score.ndcg)
            g("master_collaborative_filtering_precision_10", score.precision)
            g("master_collaborative_filtering_recall_10", score.recall)
            # time-series names match the reference (cache.CFNDCG...,
            # master/tasks.go:1087-1092)
            self._record_ts(ck.CF_NDCG, score.ndcg)
            self._record_ts(ck.CF_PRECISION, score.precision)
            self._record_ts(ck.CF_RECALL, score.recall)
        self.cf_model = model
        self.cf_index = MatrixFactorizationIndex.from_model(
            model, item_categories=data.item_categories, timestamp=time.time()
        )
        model_id = self.blob.new_model_id()
        self.cf_index.save(self.blob.create(model_id))
        self.blob.flush(model_id)
        self.meta.put(COLLABORATIVE_FILTERING_MODEL, model_id)
        self.meta.put(
            "CF_MODEL_META",
            json.dumps({"type": mtype, "params": mparams, "score": score.ndcg}),
        )
        self.cache.set(ck.LAST_FIT_MATCHING_MODEL_TIME, str(time.time()))
        self._sync_cf_vectors()
        logger.info("CF model %s (%s) trained: NDCG@10=%.4f", model_id, mtype, score.ndcg)

    CF_COLLECTION = "collaborative_filtering"

    def _sync_cf_vectors(self) -> None:
        """Maintain the CF item-factor collection in the vector store
        (reference: initCollaborativeFilteringVectorCollection + check,
        master/master.go:424-478): recreate on dimension/quantization
        mismatch, then upsert every item's factors."""
        if self.vectors is None or self.cf_index is None:
            return
        factors = np.asarray(self.cf_index.item_factors)
        dim = int(factors.shape[1])
        db_cfg = self.config.database
        want_q = db_cfg.vector_quantization_type
        want_bits = db_cfg.vector_quantization_bits
        info = self.vectors.describe_collection(self.CF_COLLECTION)
        # bits as *configured* are compared against the meta-store record of
        # what this master last created the collection with (backends
        # normalize bits differently, so describe_collection alone can't
        # detect a bits-only config change without recreate loops)
        created_with = None
        if self.meta is not None:
            raw = self.meta.get("cf_vector_config")
            if raw:
                try:
                    created_with = json.loads(raw)
                except ValueError:
                    created_with = None
        bits_changed = created_with is not None and (
            created_with.get("quantization") != want_q
            or created_with.get("bits") != want_bits
        )
        if info is not None and (
            info["dimension"] != dim
            or info.get("quantization", "") != want_q
            or bits_changed
        ):
            logger.warning(
                "recreating CF vector collection: dim %s->%s quantization %r->%r bits->%s",
                info["dimension"], dim, info.get("quantization", ""), want_q, want_bits,
            )
            self.vectors.drop_collection(self.CF_COLLECTION)
            info = None
        if info is None:
            self.vectors.create_collection(
                self.CF_COLLECTION, dim, distance="dot",
                quantization=want_q, bits=want_bits,
            )
            if self.meta is not None:
                self.meta.put(
                    "cf_vector_config",
                    json.dumps({"quantization": want_q, "bits": want_bits}),
                )
        # predictable items only, like the reference's index build
        # (master/tasks.go:1012-1021)
        ids, serving = self.cf_index.serving_items()
        self.vectors.add(self.CF_COLLECTION, ids, serving)

    def train_click_through_rate(self, data: LoadedData) -> None:
        """Reference: trainClickThroughRatePrediction master/tasks.go:1111-1219."""
        if self.config.recommend.ranker.type != "fm" or data.ctr is None or len(data.ctr) == 0:
            return
        if data.ctr.count_positive() == 0 or data.ctr.count_negative() == 0:
            logger.info("skip CTR training: single-class data")
            return
        ranker_cfg = self.config.recommend.ranker
        with self.progress.span("fit_ctr_model"):
            train, test = data.ctr.split(0.2, seed=0)
            params = Params(self.meta_model_params("ctr"))
            if ranker_cfg.fit_epoch > 0:
                params = Params({"n_epochs": ranker_cfg.fit_epoch}).merged(params)
            model = AFM(params)
            t0 = time.perf_counter()
            score = model.fit(
                train, test,
                FitConfig(
                    verbose=10, patience=ranker_cfg.early_stopping.patience,
                    mesh=self.training_mesh(),
                ),
            )
            # reference: RankingFitSeconds + RankingAUC/Precision/Recall,
            # master/metrics.go:121-144
            g = self.metrics.gauge_set
            g("master_ranking_fit_seconds", time.perf_counter() - t0)
            g("master_ranking_model_auc", score.auc)
            g("master_ranking_model_precision", score.precision)
            g("master_ranking_model_recall", score.recall)
            self._record_ts(ck.CTR_AUC, score.auc)
            self._record_ts(ck.CTR_PRECISION, score.precision)
            self._record_ts(ck.CTR_RECALL, score.recall)
        self.ctr_model = model
        model_id = self.blob.new_model_id()
        model.save(self.blob.create(model_id))
        self.blob.flush(model_id)
        self.meta.put(CLICK_THROUGH_RATE_MODEL, model_id)
        self.cache.set(ck.LAST_FIT_RANKING_MODEL_TIME, str(time.time()))
        logger.info("CTR model %s trained: AUC=%.4f", model_id, score.auc)

    def meta_model_params(self, kind: str) -> dict:
        """Best params from past hyper-parameter search, if recorded."""
        raw = self.meta.get(f"BEST_PARAMS_{kind.upper()}")
        return json.loads(raw) if raw else {}

    def search_model(self, data: LoadedData, kind: str = "cf", n_trials: int | None = None) -> dict:
        """Hyper-parameter search (reference: optimizeCF/optimizeCTR
        master/tasks.go:1303-1398, goptuna TPE)."""
        cfg = self.config.recommend.collaborative
        ranker_cfg = self.config.recommend.ranker
        n_trials = n_trials or (
            cfg.optimize_trials if kind == "cf" else ranker_cfg.optimize_trials
        )
        with self.progress.span(f"search_{kind}_model"):
            t0 = time.perf_counter()
            if kind == "cf":
                # model type is part of the search space (reference:
                # cf.ModelSearch over {"BPR","ALS"}, master/tasks.go:1318-1324)
                patience = cfg.early_stopping.patience

                def objective(mtype: str, p: Params) -> float:
                    model = create_mf_model(
                        mtype, Params(n_epochs=cfg.model_search_epoch).merged(p)
                    )
                    return model.fit(
                        data.train, data.test,
                        FitConfig(verbose=cfg.model_search_epoch, patience=patience),
                    ).ndcg

                best_type, best, value, _ = model_type_search(
                    {"bpr": BPR_SPACE, "als": ALS_SPACE}, objective, n_trials=n_trials
                )
                self.meta.put(
                    "CF_SEARCH_TARGET",
                    json.dumps({"type": best_type, "params": dict(best), "score": value}),
                )
            else:
                from ..models.optimize import AFM_SPACE

                train, test = data.ctr.split(0.2, seed=0)

                def objective(p: Params) -> float:
                    model = AFM(Params(n_epochs=cfg.model_search_epoch).merged(p))
                    return model.fit(train, test, FitConfig(verbose=cfg.model_search_epoch)).auc

                best, value, _ = model_search(objective, AFM_SPACE, n_trials=n_trials)
            # reference: CollaborativeFilteringSearchSeconds/Precision10 and
            # RankingSearchSeconds/Precision gauges, master/metrics.go:96-148
            g = self.metrics.gauge_set
            if kind == "cf":
                g("master_collaborative_filtering_search_seconds", time.perf_counter() - t0)
                g("master_collaborative_filtering_search_precision_10", value)
            else:
                g("master_ranking_search_seconds", time.perf_counter() - t0)
                g("master_ranking_search_precision", value)
            self.meta.put(f"BEST_PARAMS_{kind.upper()}", json.dumps(dict(best)))
            logger.info("model search %s: best=%.4f params=%s", kind, value, dict(best))
            return dict(best)

    def collect_garbage(self, data: LoadedData | None = None) -> None:
        """Drop stale model blobs (reference: master/tasks.go:1221-1247) and
        prune cache score collections whose subset refers to a removed
        recommender config or a deleted user/item (reference: collectGarbage
        master/tasks.go:1249-1301)."""
        keep = {
            self.meta.get(COLLABORATIVE_FILTERING_MODEL),
            self.meta.get(CLICK_THROUGH_RATE_MODEL),
        }
        for name in self.blob.list():
            if name not in keep:
                self.blob.remove(name)
        if data is None:
            return
        t0 = time.perf_counter()
        cfg = self.config.recommend
        # built-in popular/latest are registered by update_non_personalized
        np_names = {e.name for e in cfg.non_personalized} | {"popular", "latest"}
        i2i_names = {e.name for e in cfg.item_to_item}
        u2u_names = {e.name for e in cfg.user_to_user}
        dataset = data.dataset
        # deletion cutoff = the dataset snapshot time, NOT GC-start: rows
        # written for entities created after the snapshot must survive
        # (reference: Before=dataSet.GetTimestamp(), master/tasks.go:1273-1296)
        before = data.timestamp or time.time()
        scanned = reclaimed = 0
        for collection in (ck.NON_PERSONALIZED, ck.ITEM_TO_ITEM, ck.USER_TO_USER, ck.COLLABORATIVE):
            subsets = set(self.cache.scan_score_subsets(collection))
            scanned += len(subsets)
            stale: list[str] = []
            stale_digest_keys: list[str] = []
            for subset in subsets:
                if collection == ck.NON_PERSONALIZED:
                    if subset not in np_names:
                        stale.append(subset)
                elif collection == ck.ITEM_TO_ITEM:
                    name, _, item_id = subset.partition("/")
                    if name not in i2i_names or dataset.item_dict.to_number(item_id) < 0:
                        stale.append(subset)
                        stale_digest_keys.append(key(ck.ITEM_TO_ITEM_DIGEST, name, item_id))
                elif collection == ck.USER_TO_USER:
                    name, _, user_id = subset.partition("/")
                    if name not in u2u_names or dataset.user_dict.to_number(user_id) < 0:
                        stale.append(subset)
                        stale_digest_keys.append(key(ck.USER_TO_USER_DIGEST, name, user_id))
                else:  # collaborative filtering: subset is the user id
                    if dataset.user_dict.to_number(subset) < 0:
                        stale.append(subset)
                        stale_digest_keys.append(key(ck.COLLABORATIVE_DIGEST, subset))
            if stale:
                # non-personalized rows for removed configs go unconditionally;
                # entity-keyed rows keep anything written after the snapshot
                self.cache.delete_scores(
                    collection, stale,
                    before=None if collection == ck.NON_PERSONALIZED else before,
                )
                # companion digest keys would otherwise leak forever
                for k_ in stale_digest_keys:
                    self.cache.delete(k_)
                reclaimed += len(stale)
        # reference: CacheScannedTotal/CacheReclaimedTotal/CacheScannedSeconds,
        # master/metrics.go:74-88
        g = self.metrics.gauge_set
        g("master_cache_scanned_total", scanned)
        g("master_cache_reclaimed_total", reclaimed)
        g("master_cache_scanned_seconds", time.perf_counter() - t0)

    def _record_ts(self, name: str, value: float) -> None:
        self.cache.add_time_series_points(
            [TimeSeriesPoint(name=name, timestamp=time.time(), value=float(value))]
        )

    # ----------------------------------------------------------- main loop

    def run_tasks_once(self, search: bool = False) -> LoadedData:
        """One full pass of the task sequence (reference:
        master/tasks.go:229-271 runLoadDatasetTask + training tasks)."""
        data = self.load_dataset()
        self.update_non_personalized(data)
        self.update_item_to_item(data)
        self.update_user_to_user(data)
        self.train_collaborative_filtering(data)
        self.train_click_through_rate(data)
        now = time.time()
        if search:
            self._last_optimize["cf"] = now
            self.search_model(data, "cf")
        # periodic hyper-parameter search (reference: master/tasks.go:260-266
        # runs the optimize task when OptimizePeriod > 0; here additionally
        # throttled to at most once per optimize_period)
        cf_cfg = self.config.recommend.collaborative
        if (
            cf_cfg.optimize_period > 0
            and cf_cfg.type != "none"
            and now - self._last_optimize.get("cf", 0.0) >= cf_cfg.optimize_period * 60.0
            and data.train.count_feedback() > 0
        ):
            self._last_optimize["cf"] = now
            self.search_model(data, "cf")
        ranker_cfg = self.config.recommend.ranker
        if (
            ranker_cfg.optimize_period > 0
            and ranker_cfg.type == "fm"
            and now - self._last_optimize.get("ctr", 0.0) >= ranker_cfg.optimize_period * 60.0
            and data.ctr is not None
            and len(data.ctr) > 0
        ):
            self._last_optimize["ctr"] = now
            self.search_model(data, "ctr")
        self.collect_garbage(data)
        # deep memory accounting per component (reference: sizeof.DeepSize
        # gauges, master/tasks.go:211-222), rendered at /metrics — at most
        # once a minute: the recursive Python walk is O(nnz) and measured
        # 6 s of a 23 s playground cycle (the reference's DeepSize is
        # compiled Go; ours is not, and the gauges don't need per-cycle
        # freshness)
        now_ts = time.perf_counter()
        last_t = getattr(self, "_sizeof_ts", -1e9)
        if now_ts - last_t > 60.0 and not getattr(self, "_sizeof_busy", False):
            self._sizeof_ts = now_ts
            self._sizeof_busy = True

            def _account(data=data):
                from ..utils.sizeof import deep_size

                try:
                    sizes = {
                        "dataset": deep_size(data),
                        "cf_index": deep_size(self.cf_index),
                        "ctr_model": deep_size(self.ctr_model),
                    }
                    self.memory_inuse = sizes
                    for component, nbytes in sizes.items():
                        # reference: MemoryInUseBytesVec{data=...},
                        # master/metrics.go:211-222
                        self.metrics.gauge_set(
                            "master_memory_inuse_bytes", nbytes,
                            labels={"data": component},
                        )
                except Exception:  # noqa: BLE001 — a concurrent mutation
                    # mid-walk (next cycle rebuilding the dataset) only
                    # costs this sample; the previous gauges stand
                    logger.debug("memory accounting walk aborted", exc_info=True)
                finally:
                    self._sizeof_busy = False

            threading.Thread(
                target=_account, name="memory-accounting", daemon=True
            ).start()
        return data

    def trigger(self) -> None:
        """Schedule an immediate task-loop run (dashboard 'train now')."""
        self._trigger.set()

    def run_tasks_loop(self) -> None:
        """Reference: RunTasksLoop master/master.go:490-511."""
        period = self.config.recommend.collaborative.model_fit_period * 60.0
        while not self._stop.is_set():
            try:
                self.run_tasks_once()
            except Exception:  # noqa: BLE001 — keep the loop alive
                logger.exception("task loop iteration failed")
            self._trigger.wait(timeout=period)
            self._trigger.clear()

    def serve_background(self) -> None:
        self._thread = threading.Thread(target=self.run_tasks_loop, daemon=True)
        self._thread.start()

    def shutdown(self) -> None:
        self._stop.set()
        self._trigger.set()
        if self._thread:
            self._thread.join(timeout=5.0)
        from ..utils.tracing import tracer

        tracer().flush()  # export trailing spans (< batch_size) on stop
