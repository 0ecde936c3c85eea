"""Worker node: offline per-user recommendation pipeline.

Covers the reference's worker/ package: each worker owns a shard of users
(consistent hashing over the live worker set, worker/worker.go:429-458),
pulls models from the blob store by id (Pull :262-320), and materializes the
``recommend`` cache collection per user (Pipeline.Recommend
worker/pipeline.go:91-287) with staleness checks, CF + recommender-chain
candidates, replacement, and CTR ranking.

TPU-native differences:
- user sharding uses rendezvous (highest-random-weight) hashing — the same
  redistribute-on-membership-change property as the reference's hash ring,
  in a few lines;
- the collaborative top-k for ALL shard users is ONE device batch
  (logics/cf.py search_users) instead of per-user brute force;
- CTR ranking batches all (user, candidate) rows of the shard into one
  device call (the reference batches per user: worker/pipeline.go:421-470).
"""

from __future__ import annotations

import hashlib
import json
import logging
import time

from ..logics.cf import MatrixFactorizationIndex
from ..logics.recommend import Recommender
from ..models.fm import AFM
from ..storage import cache as ck
from ..storage.blob import BlobStore
from ..storage.cache import CacheStore, key
from ..storage.data import DataStore
from ..storage.types import Score
from ..utils.config import Config
from ..utils.expression import match_any
from .progress import ProgressTracker

logger = logging.getLogger(__name__)


def rendezvous_owner(user_id: str, nodes: list[str]) -> str | None:
    """Highest-random-weight owner of ``user_id`` among ``nodes``."""
    if not nodes:
        return None
    return max(
        nodes,
        key=lambda n: hashlib.md5(f"{n}\x00{user_id}".encode()).digest(),
    )


class Worker:
    """Reference: worker.Worker (worker/worker.go:56-101)."""

    def __init__(
        self,
        config: Config,
        data_store: DataStore,
        cache_store: CacheStore,
        blob_store: BlobStore,
        node_id: str = "worker-0",
        openai_client=None,
    ) -> None:
        self.config = config
        self.data = data_store
        self.cache = cache_store
        self.blob = blob_store
        self.node_id = node_id
        self.progress = ProgressTracker()
        self.cf_index: MatrixFactorizationIndex | None = None
        self.cf_model_id = ""
        self.ctr_model: AFM | None = None
        self.ctr_model_id = ""
        from .item_cache import ItemCache

        # worker-local item metadata with BF16 label compression
        # (reference: ItemCache worker/pipeline.go:42-77)
        self.items = ItemCache(data_store)
        if openai_client is None and config.openai.base_url:
            from ..llm.client import OpenAIClient

            openai_client = OpenAIClient.from_config(config.openai)
        self.openai_client = openai_client

    # ------------------------------------------------------------- syncing

    def pull_models(self, cf_model_id: str, ctr_model_id: str) -> None:
        """Pull new model artifacts by id (reference: Pull worker/worker.go:262-320)."""
        if cf_model_id and cf_model_id != self.cf_model_id and self.blob.exists(cf_model_id):
            self.cf_index = MatrixFactorizationIndex.load(self.blob.open(cf_model_id))
            self.cf_model_id = cf_model_id
            logger.info("pulled CF model %s", cf_model_id)
        if ctr_model_id and ctr_model_id != self.ctr_model_id and self.blob.exists(ctr_model_id):
            self.ctr_model = AFM.load(self.blob.open(ctr_model_id))
            self.ctr_model_id = ctr_model_id
            logger.info("pulled CTR model %s", ctr_model_id)

    def pull_users(self, peers: list[str]) -> list[str]:
        """My shard of users (reference: pullUsers worker/worker.go:429-458)."""
        peers = peers or [self.node_id]
        return [
            u.user_id
            for u in self.data.get_users()
            if rendezvous_owner(u.user_id, peers) == self.node_id
        ]

    # ------------------------------------------------------------ pipeline

    def needs_update(self, user_id: str) -> bool:
        """Staleness check (reference: checkRecommendCacheOutOfDate
        worker/pipeline.go:316-369): recompute when the cached digest differs
        from the active config/model digest, the user was modified since the
        last update, or the cache has expired."""
        digest = self.cache.get(key(ck.RECOMMEND_DIGEST, user_id))
        if digest != self._active_digest():
            return True
        last_modified = float(self.cache.get(key(ck.LAST_MODIFY_USER_TIME, user_id)) or 0)
        last_update = float(
            self.cache.get(key(ck.LAST_UPDATE_USER_RECOMMEND_TIME, user_id)) or 0
        )
        if last_modified > last_update:
            return True
        expire_s = self.config.recommend.cache_expire * 3600.0
        return (time.time() - last_update) > expire_s

    def is_active(self, user_id: str) -> bool:
        """Skip long-inactive users (reference: pipeline.go:148 active
        checks via ActiveUserTTL)."""
        ttl_days = self.config.recommend.active_user_ttl
        if ttl_days <= 0:
            return True
        fb = self.data.get_user_feedback(user_id)
        if not fb:
            return False
        newest = max(f.timestamp for f in fb)
        return (time.time() - newest) <= ttl_days * 86400

    def _active_digest(self) -> str:
        return hashlib.md5(
            (
                self.config.offline_recommend_digest()
                + self.cf_model_id
                + self.ctr_model_id
            ).encode()
        ).hexdigest()

    def recommend(self, user_ids: list[str], force: bool = False) -> int:
        """Materialize recommendations for users (reference:
        Pipeline.Recommend worker/pipeline.go:91-287). Returns the number of
        users refreshed."""
        cfg = self.config.recommend
        todo = [
            u for u in user_ids if force or (self.is_active(u) and self.needs_update(u))
        ]
        if not todo:
            return 0
        self.items.clear()  # fresh metadata per pipeline run
        with self.progress.span("recommend", total=len(todo)) as span:
            # STEP 1: collaborative scores for the whole shard in ONE batch
            if self.cf_index is not None:
                exclude = [
                    [fb.item_id for fb in self.data.get_user_feedback(u)] for u in todo
                ]
                cf_results = self.cf_index.search_users(
                    todo, cfg.cache_size, exclude=exclude, use_pallas=False
                )
                for user_id, scores in zip(todo, cf_results):
                    if scores:
                        self.cache.add_scores(ck.COLLABORATIVE, user_id, scores)
                        self.cache.set(
                            key(ck.COLLABORATIVE_DIGEST, user_id), self.cf_model_id
                        )
            # STEP 2: per-user candidate assembly via the recommender chain
            candidates: dict[str, list[Score]] = {}
            for user_id in todo:
                recommender = Recommender(
                    cfg, self.cache, self.data, online=False, user_id=user_id
                )
                chain = cfg.ranker.recommenders or ["collaborative"]
                scores, _ = recommender.recommend_sequential([], cfg.cache_size, chain)
                scores = self._insert_replacement(user_id, scores, recommender)
                candidates[user_id] = scores
            # STEP 3: ranking — FM model over all rows at once, or passthrough
            ranked = self._rank(candidates)
            now = time.time()
            for user_id, scores in ranked.items():
                for s in scores:
                    s.timestamp = now
                self.cache.add_scores(ck.RECOMMEND, user_id, scores)
                self.cache.set(key(ck.RECOMMEND_DIGEST, user_id), self._active_digest())
                self.cache.set(key(ck.LAST_UPDATE_USER_RECOMMEND_TIME, user_id), str(now))
                # prune stale entries from previous runs (reference :257-273)
                self.cache.delete_scores(ck.RECOMMEND, [user_id], before=now)
                span.add(1)
        return len(todo)

    def _insert_replacement(
        self, user_id: str, scores: list[Score], recommender: Recommender
    ) -> list[Score]:
        """Re-insert consumed items with decayed scores when replacement is
        enabled (reference: worker/pipeline.go:542-614)."""
        cfg = self.config.recommend
        if not cfg.replacement.enable_replacement:
            return scores
        existing = {s.id for s in scores}
        upper = max((s.score for s in scores), default=0.0)
        lower = min((s.score for s in scores), default=0.0)
        out = list(scores)
        for fb in recommender.user_feedback:
            if fb.item_id in existing:
                continue
            item = self.items.get(fb.item_id)
            if item is None or item.is_hidden:
                continue
            if match_any(cfg.data_source.positive_feedback_types, fb.feedback_type, fb.value):
                decay = cfg.replacement.positive_replacement_decay
            elif match_any(cfg.data_source.read_feedback_types, fb.feedback_type, fb.value):
                decay = cfg.replacement.read_replacement_decay
            else:
                continue
            # scale into the score range then decay (reference :584-604)
            score = upper if upper > lower else 1.0
            out.append(
                Score(id=fb.item_id, score=score * decay, categories=item.categories)
            )
            existing.add(fb.item_id)
        return out

    def _rank(self, candidates: dict[str, list[Score]]) -> dict[str, list[Score]]:
        """CTR ranking across the whole shard in one device batch
        (reference: rankByCollaborativeFiltering / rankByClickTroughRate
        worker/pipeline.go:421-470)."""
        cfg = self.config.recommend
        if cfg.ranker.type == "llm" and self.openai_client is not None:
            return self._rank_llm(candidates)
        if cfg.ranker.type != "fm" or self.ctr_model is None or not self.ctr_model.is_fitted():
            return {
                u: sorted(s, key=lambda x: -x.score) for u, s in candidates.items()
            }
        rows = []
        owners = []
        index = self.ctr_model.index
        # one batched metadata fetch for the whole shard's candidates
        self.items.prefetch([s.id for scores in candidates.values() for s in scores])
        for user_id, scores in candidates.items():
            user = self.data.get_user(user_id)
            for s in scores:
                item = self.items.get(s.id)
                idx, val = [], []
                u_enc = index.encode_user(user_id)
                if u_enc >= 0:
                    idx.append(u_enc)
                    val.append(1.0)
                i_enc = index.encode_item(s.id)
                if i_enc >= 0:
                    idx.append(i_enc)
                    val.append(1.0)
                from ..logics.item_to_item import _flatten_labels

                if user is not None:
                    for l in _flatten_labels(user.labels):
                        l_enc = index.encode_user_label(l)
                        if l_enc >= 0:
                            idx.append(l_enc)
                            val.append(1.0)
                if item is not None:
                    for l in _flatten_labels(item.labels):
                        l_enc = index.encode_item_label(l)
                        if l_enc >= 0:
                            idx.append(l_enc)
                            val.append(1.0)
                rows.append((idx, val))
                owners.append((user_id, s))
        if not rows:
            return candidates
        preds = self.ctr_model.batch_predict(rows)
        ranked: dict[str, list[Score]] = {u: [] for u in candidates}
        for (user_id, s), p in zip(owners, preds):
            ranked[user_id].append(Score(s.id, float(p), s.categories, s.timestamp))
        return {u: sorted(s, key=lambda x: -x.score) for u, s in ranked.items()}

    def _rank_llm(self, candidates: dict[str, list[Score]]) -> dict[str, list[Score]]:
        """LLM reranking (reference: rankByLLM worker/pipeline.go:472-540).

        With [recommend.ranker.reranker_api] configured, candidates go through
        the reranker HTTP API with the config's query/document templates
        (reference: NewChatReranker worker/pipeline.go:234-238); otherwise the
        chat-completions reranker prompts the OpenAI endpoint directly."""
        from ..logics.chat import ChatReranker, LLMReranker, RerankerClient

        cfg = self.config.recommend
        api = cfg.ranker.reranker_api
        if api.url:
            chat_reranker = ChatReranker(
                RerankerClient(api.url, auth_token=api.auth_token, model=api.model),
                cfg.ranker.query_template or "{{ user.user_id }}",
                cfg.ranker.document_template or "{{ item.item_id }}",
            )
            return self._rank_reranker_api(candidates, chat_reranker)
        reranker = LLMReranker(self.openai_client, prompt=cfg.ranker.prompt)
        out: dict[str, list[Score]] = {}
        for user_id, scores in candidates.items():
            user = self.data.get_user(user_id)
            history: list[tuple[str, object]] = []
            for fb in self.data.get_user_feedback(user_id):
                if len(history) >= cfg.context_size:
                    break
                if match_any(cfg.data_source.positive_feedback_types, fb.feedback_type, fb.value):
                    item = self.items.get(fb.item_id)
                    if item is not None:
                        history.append((fb.feedback_type, item))
            self.items.prefetch([s.id for s in scores])
            items = {
                s.id: it
                for s in scores
                if (it := self.items.get(s.id)) is not None
            }
            out[user_id] = reranker.rank(user, history, scores, items)
        return out

    def _rank_reranker_api(self, candidates: dict[str, list[Score]], reranker) -> dict[str, list[Score]]:
        """Rank through the reranker HTTP API (reference: rankByLLM
        worker/pipeline.go:472-540 with logics.ChatReranker)."""
        cfg = self.config.recommend
        out: dict[str, list[Score]] = {}
        for user_id, scores in candidates.items():
            user = self.data.get_user(user_id)
            history: list[tuple[str, object]] = []
            for fb in self.data.get_user_feedback(user_id):
                if len(history) >= cfg.context_size:
                    break
                if match_any(cfg.data_source.positive_feedback_types, fb.feedback_type, fb.value):
                    item = self.items.get(fb.item_id)
                    if item is not None:
                        history.append((fb.feedback_type, item))
            self.items.prefetch([s.id for s in scores])
            items = [it for s in scores if (it := self.items.get(s.id)) is not None]
            try:
                ranked = reranker.rank(user, history, items)
            except Exception as e:  # noqa: BLE001 — degrade to unranked
                logger.error("reranker API failed for %s: %s", user_id, e)
                out[user_id] = scores
                continue
            ts = {s.id: s.timestamp for s in scores}
            out[user_id] = [
                Score(r.id, r.score, r.categories, ts.get(r.id)) for r in ranked
            ]
        return out

    # ------------------------------------------------------------ main loop

    def sync_and_recommend(self, master) -> int:
        """One worker cycle against an in-process master (the reference's
        Sync + loop; multi-process deployments poll /api/admin/meta)."""
        meta = master.get_meta()
        self.pull_models(meta["cf_model_id"], meta["ctr_model_id"])
        peers = meta["workers"] or [self.node_id]
        users = self.pull_users(peers)
        n = self.recommend(users)
        master.progress.push_remote(self.node_id, self.progress.list())
        return n
