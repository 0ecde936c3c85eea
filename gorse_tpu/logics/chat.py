"""LLM-backed recommenders: chat item-to-item and rerankers.

Covers the reference's logics/chat.go (ChatReranker over a reranker HTTP API)
and the chat item-to-item engine (logics/item_to_item.go:383-531): a jinja
prompt rendered per item -> chat completion -> parsed queries -> query
embeddings -> nearest-neighbor search over item embeddings. Neighbor search
is the batched exact kernel (ops/similarity.embedding_query) instead of HNSW.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import urllib.request

import jinja2
import numpy as np

from ..llm.client import OpenAIClient, parse_array_from_completion, strip_think
from ..storage.types import Feedback, Item, Score, User
from .item_to_item import EmbeddingItemToItem, ItemToItemConfig, _extract_embedding

logger = logging.getLogger(__name__)

_jinja = jinja2.Environment(undefined=jinja2.ChainableUndefined)


class ChatItemToItem(EmbeddingItemToItem):
    """LLM-generated-query similarity (reference: chatItemToItem)."""

    def __init__(
        self,
        cfg: ItemToItemConfig,
        n: int,
        timestamp: float | None = None,
        openai_client: OpenAIClient | None = None,
        prompt: str = "",
    ) -> None:
        super().__init__(cfg, n, timestamp)
        self.client = openai_client
        self.template = _jinja.from_string(prompt or getattr(cfg, "prompt", "") or "{{ item.item_id }}")

    def pop_all(self):
        if self.client is None or not self.client.enabled() or not self.items:
            # fall back to plain embedding similarity
            return super().pop_all()
        import jax.numpy as jnp

        from ..ops.similarity import embedding_query

        corpus = jnp.asarray(np.stack(self.vectors))
        out = []
        k = min(self.n, len(self.items))
        for row, item in enumerate(self.items):
            prompt = self.template.render(item=item)
            try:
                completion = self.client.chat_completion(prompt)
            except Exception as e:  # noqa: BLE001 — degrade per item
                logger.error("chat completion failed for %s: %s", item.item_id, e)
                out.append((item.item_id, []))
                continue
            queries = parse_array_from_completion(completion)
            if not queries:
                out.append((item.item_id, []))
                continue
            try:
                vecs = np.stack(
                    [
                        np.asarray(
                            self.client.embedding(q)[: corpus.shape[1]], dtype=np.float32
                        )
                        for q in queries
                    ]
                )
            except Exception as e:  # noqa: BLE001 — degrade per item, like
                # the chat_completion guard above: one failed embedding call
                # must not abort the whole neighbor build
                logger.error("embedding failed for %s: %s", item.item_id, e)
                out.append((item.item_id, []))
                continue
            # pad/truncate query vectors to corpus dim
            if vecs.shape[1] < corpus.shape[1]:
                vecs = np.pad(vecs, ((0, 0), (0, corpus.shape[1] - vecs.shape[1])))
            dists, idxs = embedding_query(jnp.asarray(vecs), corpus, k_top=k)
            dists, idxs = np.asarray(dists), np.asarray(idxs)
            # aggregate across queries: best (smallest) distance per neighbor
            best: dict[int, float] = {}
            for qi in range(dists.shape[0]):
                for d, j in zip(dists[qi], idxs[qi]):
                    j = int(j)
                    if j == row:
                        continue
                    if j not in best or d < best[j]:
                        best[j] = float(d)
            ranked = sorted(best.items(), key=lambda kv: kv[1])[: self.n]
            out.append(
                (
                    item.item_id,
                    [
                        Score(
                            id=self.items[j].item_id,
                            # 1/(1+distance), reference item_to_item.go:526
                            score=1.0 / (1.0 + d),
                            categories=self.items[j].categories,
                            timestamp=self.timestamp,
                        )
                        for j, d in ranked
                    ],
                )
            )
        return out


@dataclasses.dataclass
class RerankResult:
    index: int
    relevance_score: float


class RerankerClient:
    """HTTP reranker API client (reference: common/reranker/client.go):
    POST {model, query, documents} -> {results: [{index, relevance_score}]}."""

    def __init__(self, url: str, auth_token: str = "", model: str = "", timeout: float = 30.0) -> None:
        self.url = url
        self.auth_token = auth_token
        self.model = model
        self.timeout = timeout

    def rerank(self, query: str, documents: list[str]) -> list[RerankResult]:
        payload = json.dumps(
            {"model": self.model, "query": query, "documents": documents}
        ).encode()
        req = urllib.request.Request(
            self.url,
            data=payload,
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.auth_token}",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            data = json.loads(resp.read().decode())
        return [
            RerankResult(index=r["index"], relevance_score=float(r["relevance_score"]))
            for r in data.get("results", [])
        ]


class ChatReranker:
    """Rerank candidates with a reranker API (reference: logics/chat.go:39-108)
    using jinja query/document templates."""

    def __init__(self, client: RerankerClient, query_template: str, doc_template: str) -> None:
        self.client = client
        self.query_template = _jinja.from_string(query_template)
        self.doc_template = _jinja.from_string(doc_template)

    def rank(self, user: User | None, feedback: list[tuple[str, Item]], items: list[Item]) -> list[Score]:
        query = self.query_template.render(user=user, feedback=feedback)
        documents = [self.doc_template.render(item=item) for item in items]
        results = self.client.rerank(query, documents)
        return [
            Score(
                id=items[r.index].item_id,
                score=r.relevance_score,
                categories=items[r.index].categories,
            )
            for r in results
            if 0 <= r.index < len(items)
        ]


class LLMReranker:
    """Chat-completion reranker (the worker's ranker.type == "llm" path,
    worker/pipeline.go:472-540 composed with a prompt instead of a reranker
    API): render user profile + history + candidates into one prompt, ask
    the model for a ranked JSON array of item ids."""

    DEFAULT_PROMPT = (
        "You are a recommender. The user {{ user.user_id }} recently liked:\n"
        "{% for fb in feedback %}- {{ fb[1].item_id }} {{ fb[1].comment }}\n{% endfor %}"
        "Rank the following candidate items for this user, best first. "
        "Respond with ONLY a JSON array of item ids.\n"
        "{% for item in items %}- {{ item.item_id }} {{ item.comment }}\n{% endfor %}"
    )

    def __init__(self, client: OpenAIClient, prompt: str = "") -> None:
        self.client = client
        self.template = _jinja.from_string(prompt or self.DEFAULT_PROMPT)

    def rank(
        self,
        user: User | None,
        feedback: list[tuple[str, Item]],
        candidates: list[Score],
        items: dict[str, Item],
    ) -> list[Score]:
        item_objs = [items.get(s.id) or Item(item_id=s.id) for s in candidates]
        prompt = self.template.render(user=user, feedback=feedback, items=item_objs)
        try:
            completion = self.client.chat_completion(prompt)
        except Exception as e:  # noqa: BLE001
            logger.error("LLM rerank failed: %s", e)
            return candidates
        ranked_ids = parse_array_from_completion(strip_think(completion))
        by_id = {s.id: s for s in candidates}
        out: list[Score] = []
        for rank, item_id in enumerate(ranked_ids):
            s = by_id.pop(item_id, None)
            if s is not None:
                out.append(Score(s.id, float(len(ranked_ids) - rank), s.categories, s.timestamp))
        # unranked leftovers keep their relative order but must score BELOW
        # every LLM-ranked item — results are served from a score-ordered
        # cache, so leaving their original (e.g. timestamp-scale) scores
        # would put an omitted candidate above the whole LLM ranking
        for i, s in enumerate(by_id.values()):
            out.append(Score(s.id, float(-1 - i), s.categories, s.timestamp))
        return out
