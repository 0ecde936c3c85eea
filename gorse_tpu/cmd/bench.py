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

    from ..ops.topk import dot_topk, dot_topk_xla

    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(args.items, args.dim)).astype(np.float32))
    queries = [
        jnp.asarray(rng.normal(size=(args.batch, args.dim)).astype(np.float32))
        for _ in range(8)
    ]
    fn = dot_topk if args.kernel == "pallas" else dot_topk_xla
    fn(queries[0], items, args.k)  # compile
    t0 = time.perf_counter()
    outs = [fn(q, items, args.k) for q in queries]
    _ = float(jnp.sum(outs[-1][0]))  # force completion through the tunnel
    dt = time.perf_counter() - t0
    return {
        "kernel": args.kernel,
        "items": args.items,
        "batch": args.batch,
        "k": args.k,
        "queries_per_s": round(8 * args.batch / dt),
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

    p = sub.add_parser("retrieval", help="benchmark exact top-k retrieval")
    p.add_argument("--items", type=int, default=100000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--kernel", choices=["pallas", "xla"], default="pallas")

    args = parser.parse_args(argv)
    if args.cmd == "cf":
        out = evaluate_cf(args)
    elif args.cmd == "ctr":
        out = evaluate_ctr(args)
    else:
        out = evaluate_retrieval(args)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
