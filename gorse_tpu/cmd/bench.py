"""Offline evaluation harness.

Covers the reference's cmd/gorse-bench (main.go:125, 209, 322): standalone
evaluation of the CF models (BPR/ALS NDCG on a dataset), the AFM CTR ranker
(AUC), embedding similarity quality, and retrieval throughput — without a
running cluster. Datasets resolve through the built-in registry
(``synthetic://`` specs work offline).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def evaluate_cf(args) -> dict:
    from ..data import load_built_in
    from ..models import FitConfig, Params, create_mf_model

    train, test = load_built_in(args.dataset)
    model = create_mf_model(
        args.model,
        Params(n_factors=args.factors, n_epochs=args.epochs, lr=args.lr, reg=args.reg),
    )
    t0 = time.time()
    score = model.fit(
        train, test, FitConfig(verbose=args.verbose, candidates=args.candidates)
    )
    return {
        "model": args.model,
        "dataset": args.dataset,
        "NDCG@10": round(score.ndcg, 4),
        "Precision@10": round(score.precision, 4),
        "Recall@10": round(score.recall, 4),
        "fit_seconds": round(time.time() - t0, 2),
        "examples": train.count_feedback() * args.epochs,
    }


def evaluate_ctr(args) -> dict:
    from ..data.ctr import load_libfm, synthetic_ctr
    from ..models import FitConfig, Params
    from ..models.fm import AFM

    if args.dataset.startswith("synthetic"):
        data = synthetic_ctr(n_samples=args.samples, seed=0)
        train, test = data.split(0.2, seed=1)
    else:
        from ..data.loaders import dataset_dir

        base = dataset_dir() / args.dataset
        train, test = load_libfm(str(base / "train.libfm"), str(base / "test.libfm"))
    model = AFM(Params(n_factors=args.factors, n_epochs=args.epochs, lr=args.lr, reg=args.reg))
    t0 = time.time()
    score = model.fit(train, test, FitConfig(verbose=args.verbose))
    return {
        "model": "afm",
        "dataset": args.dataset,
        "AUC": round(score.auc, 4),
        "Accuracy": round(score.accuracy, 4),
        "fit_seconds": round(time.time() - t0, 2),
    }


def evaluate_retrieval(args) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.topk import PreparedItems, dot_topk, dot_topk_xla, prepare_items

    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(args.items, args.dim)).astype(np.float32))
    mm_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    prep = prepare_items(items, mm_dtype) if args.kernel == "pallas" else None
    # Chain all query batches inside ONE jitted program and force a scalar
    # readback: per-dispatch latency through the device tunnel is erratic
    # (ms..s) and would otherwise swamp the device time being measured.
    n_batches = args.batches
    qs = jnp.asarray(
        rng.normal(size=(n_batches, args.batch, args.dim)).astype(np.float32)
    )

    @jax.jit
    def run_all(qs, table):
        def one(q):
            if args.kernel == "pallas":
                p = PreparedItems(table, args.items, args.dim)
                return dot_topk(q, p, args.k)
            return dot_topk_xla(q, table, args.k)

        s, i = jax.lax.map(one, qs)
        return jnp.sum(s) + jnp.sum(i.astype(jnp.float32))

    table = prep.table if prep is not None else items
    # The MARGINAL rate between a short and a long chain cancels the
    # per-dispatch tunnel round trip (same scheme as the repo-root bench.py):
    # time(len) ~= T_dispatch + len * t_batch, so the difference isolates
    # t_batch. Falls back to the long chain's conservative total rate when
    # timing noise inverts the marginal.
    lo = max(n_batches // 4, 1)
    qs_lo = qs[:lo]
    float(run_all(qs_lo, table))  # compile + warm (short chain)
    float(run_all(qs, table))  # compile + warm (long chain)

    def timed(q) -> float:
        t0 = time.perf_counter()
        float(run_all(q, table))
        return time.perf_counter() - t0

    d_lo = min(timed(qs_lo) for _ in range(3))
    d_hi = min(timed(qs) for _ in range(3))
    if d_hi <= d_lo:
        per_batch = d_hi / n_batches
    else:
        per_batch = (d_hi - d_lo) / (n_batches - lo)
    return {
        "kernel": args.kernel,
        "dtype": args.dtype,
        "items": args.items,
        "batch": args.batch,
        "k": args.k,
        "batches_chained": n_batches,
        "queries_per_s": round(args.batch / per_batch),
        "per_batch_ms": round(per_batch * 1e3, 3),
    }


def evaluate_reranker(args) -> dict:
    """LLM-reranker offline evaluation (reference: EvaluateReranker,
    cmd/gorse-bench/main.go:209): per test user, candidates = the held-out
    positive + sampled negatives; AUC of the reranked position vs random.
    Defaults to the embedded deterministic fake-OpenAI server; point
    --api-url at a real OpenAI-compatible endpoint to benchmark a model."""
    import numpy as np

    from ..data import load_built_in
    from ..llm.client import OpenAIClient
    from ..logics.chat import LLMReranker
    from ..storage.types import Item, Score, User

    train, test = load_built_in(args.dataset)
    mock = None
    if args.api_url:
        client = OpenAIClient(args.api_url, args.api_key, chat_model=args.model)
    else:
        from ..llm.mock import MockOpenAIServer

        mock = MockOpenAIServer().start()
        client = OpenAIClient(mock.base_url, mock.auth_token)
    reranker = LLMReranker(client, prompt=args.prompt)
    rng = np.random.default_rng(0)
    aucs = []
    users = [u for u in range(test.count_users()) if test.user_feedback[u]][: args.users]
    for u in users:
        pos = test.user_feedback[u][0]
        negs = [
            int(i) for i in rng.choice(train.count_items(), size=args.candidates)
            if i not in set(train.user_feedback[u])
        ][: args.candidates - 1]
        cand_ids = [pos] + negs
        rng.shuffle(cand_ids)
        candidates = [Score(train.item_dict.to_name(int(i)), 0.0) for i in cand_ids]
        items = {s.id: Item(s.id) for s in candidates}
        feedback = [
            ("like", Item(train.item_dict.to_name(int(i))))
            for i in train.user_feedback[u][: args.context]
        ]
        ranked = reranker.rank(User(train.user_dict.to_name(u)), feedback, candidates, items)
        ranked_ids = [s.id for s in ranked]
        pos_name = train.item_dict.to_name(int(pos))
        if pos_name in ranked_ids:
            rank = ranked_ids.index(pos_name)
            aucs.append(1.0 - rank / max(len(ranked_ids) - 1, 1))
    if mock is not None:
        mock.close()
    return {
        "dataset": args.dataset,
        "api": args.api_url or "mock://deterministic",
        "users": len(users),
        "AUC": round(float(np.mean(aucs)) if aucs else 0.0, 4),
        "note": "AUC 0.5 = random ordering",
    }


def evaluate_embedding(args) -> dict:
    """Embedding-similarity quality (reference: EvaluateEmbedding,
    cmd/gorse-bench/main.go:322): embed each item's text via the (mock or
    real) embedding API, take top-k embedding neighbors, and report recall
    against co-consumption neighbors (users-IDF ground truth)."""
    import numpy as np

    from ..data import load_built_in
    from ..llm.client import OpenAIClient
    from ..ops.similarity import embedding_neighbors, idf_neighbors, incidence_matrix

    train, _ = load_built_in(args.dataset)
    mock = None
    if args.api_url:
        client = OpenAIClient(args.api_url, args.api_key, embedding_model=args.model)
    else:
        from ..llm.mock import MockOpenAIServer

        mock = MockOpenAIServer(dimensions=args.dim).start()
        client = OpenAIClient(mock.base_url, mock.auth_token)
    n_items = train.count_items()
    vecs = np.stack(
        [client.embedding(f"item {train.item_dict.to_name(i)}") for i in range(n_items)]
    ).astype(np.float32)
    _, emb_idx = embedding_neighbors(vecs, k_top=args.k, metric="euclidean")
    # ground truth: co-consumption neighbors (the users-IDF similarity)
    inc = incidence_matrix(
        [train.item_feedback[i] for i in range(n_items)], train.count_users()
    )
    _, gt_idx = idf_neighbors(inc, train.user_idf(), k_top=args.k)
    emb_idx, gt_idx = np.asarray(emb_idx), np.asarray(gt_idx)
    recalls = [
        len(set(emb_idx[i]) & set(gt_idx[i])) / args.k for i in range(n_items)
    ]
    if mock is not None:
        mock.close()
    return {
        "dataset": args.dataset,
        "api": args.api_url or "mock://hash-embeddings",
        "items": n_items,
        "k": args.k,
        "recall_vs_coconsumption": round(float(np.mean(recalls)), 4),
        "note": "mock embeddings are content hashes; real models score higher",
    }


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="gorse-tpu-bench")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("cf", help="evaluate a CF model")
    p.add_argument("--dataset", default="synthetic://1000,800,8,0.05,0")
    p.add_argument("--model", choices=["bpr", "als"], default="bpr")
    p.add_argument("--factors", type=int, default=16)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--reg", type=float, default=0.01)
    p.add_argument("--candidates", type=int, default=100)
    p.add_argument("--verbose", type=int, default=10)

    p = sub.add_parser("ctr", help="evaluate the AFM ranker")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--samples", type=int, default=5000)
    p.add_argument("--factors", type=int, default=8)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--reg", type=float, default=1e-4)
    p.add_argument("--verbose", type=int, default=10)

    p = sub.add_parser("reranker", help="evaluate an LLM reranker")
    p.add_argument("--dataset", default="synthetic://200,150,8,0.08,0")
    p.add_argument("--api-url", default="", help="OpenAI-compatible endpoint (default: embedded mock)")
    p.add_argument("--api-key", default="")
    p.add_argument("--model", default="")
    p.add_argument("--prompt", default="")
    p.add_argument("--users", type=int, default=20)
    p.add_argument("--candidates", type=int, default=10)
    p.add_argument("--context", type=int, default=5)

    p = sub.add_parser("embedding", help="evaluate embedding similarity quality")
    p.add_argument("--dataset", default="synthetic://200,150,8,0.08,0")
    p.add_argument("--api-url", default="", help="OpenAI-compatible endpoint (default: embedded mock)")
    p.add_argument("--api-key", default="")
    p.add_argument("--model", default="")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--k", type=int, default=10)

    p = sub.add_parser("retrieval", help="benchmark exact top-k retrieval")
    p.add_argument("--items", type=int, default=100000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--kernel", choices=["pallas", "xla"], default="pallas")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    p.add_argument("--batches", type=int, default=32, help="query batches chained per dispatch")

    args = parser.parse_args(argv)
    evals = {
        "cf": evaluate_cf,
        "ctr": evaluate_ctr,
        "reranker": evaluate_reranker,
        "embedding": evaluate_embedding,
        "retrieval": evaluate_retrieval,
    }
    out = evals[args.cmd](args)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
