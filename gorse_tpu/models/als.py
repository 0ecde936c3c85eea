"""eALS — element-wise weighted ALS for implicit feedback, TPU-native.

Covers the reference's model/cf/model.go:559-792 (named ``ALS``, actually
eALS: weight 1 on observed entries, weight ``alpha`` on all missing entries,
per He et al. 2016). The reference does scalar coordinate descent with running
residuals (hot loops :659-738) — inherently sequential per factor.

TPU-native reformulation (SURVEY.md §7 "hard parts"): the CCD inner loop is
coordinate descent on a per-row ridge system whose EXACT solution is

    p_u = [(1-a) * Sum_{i in R_u} q_i q_i^T + a * Q^T Q + reg*I]^{-1}
          * Sum_{i in R_u} q_i

(and symmetrically for items). We solve that system exactly per row with
batched k x k Cholesky solves — strictly stronger per epoch than one CCD
sweep, matmul-rich, and embarrassingly parallel over rows. The NDCG baseline
is preserved (it converges to the same fixed point).

Memory: rows are processed in fixed-size blocks via ``lax.map`` so the
gathered [block, L, k] factor slabs stay well under HBM limits regardless of
catalog size.
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import Dataset
from .base import MatrixFactorization, Score, build_eval_candidates, evaluate_mf
from .params import ALPHA, INIT_MEAN, INIT_STDDEV, N_EPOCHS, N_FACTORS, REG, FitConfig, Params

logger = logging.getLogger(__name__)


def _als_solve_rows(
    other_factors: jax.Array,  # [M, k] fixed side
    padded_fb: jax.Array,  # [N, L] int32 ids into other side, pad=-1 (N % block == 0)
    block: int,
    alpha: float,
    reg: float,
    gram: jax.Array | None = None,  # optional precomputed [k, k] masked gram
    other_mask: jax.Array | None = None,  # [M] 1.0 where the fixed row HAS feedback
) -> jax.Array:
    """One half-epoch: exact weighted ridge solve for every row.

    The alpha-weighted Gram S accumulates ONLY over fixed-side rows that
    have feedback — the reference skips feedback-less rows when building S
    (model/cf/model.go:646-659), and without the mask their random init
    contaminates the first epoch's solves (VERDICT r2 weak #5). Pass
    ``other_mask`` (or a pre-masked ``gram``); ``None`` keeps the unmasked
    Gram for dense corpora where every row has feedback.

    Un-jitted so the sharded path (parallel/sharded.py) can call it inside a
    ``shard_map`` body on a row shard; ``gram`` must then come from the full
    (replicated) table so every shard solves against the same alpha term.
    """
    n = padded_fb.shape[0]
    k = other_factors.shape[1]
    if gram is None:
        masked = (
            other_factors
            if other_mask is None
            else other_factors * other_mask[:, None].astype(other_factors.dtype)
        )
        gram = masked.T @ masked  # [k, k] = S (alpha-weighted global term)

    padded_blocks = padded_fb.reshape(n // block, block, -1)

    def solve_block(fb_blk):  # [block, L]
        mask = (fb_blk >= 0).astype(other_factors.dtype)[..., None]  # [b, L, 1]
        q = jnp.take(other_factors, jnp.maximum(fb_blk, 0), axis=0) * mask  # [b, L, k]
        # A = (1-alpha) * q^T q + alpha * S + reg*I
        a = (1.0 - alpha) * jnp.einsum(
            "blk,blj->bkj", q, q, preferred_element_type=jnp.float32
        )
        a = a + alpha * gram + reg * jnp.eye(k, dtype=a.dtype)
        b = jnp.sum(q, axis=1)  # [b, k]
        return jax.scipy.linalg.cho_solve(
            (jax.scipy.linalg.cholesky(a, lower=True), True), b
        )

    out = jax.lax.map(solve_block, padded_blocks)  # [n//block, block, k]
    return out.reshape(n, k)


_als_solve_side = jax.jit(
    _als_solve_rows, static_argnames=("block", "alpha", "reg")
)


def _has_feedback_mask(padded_fb: np.ndarray, n_rows: int) -> jnp.ndarray:
    """[n_rows] f32 mask: 1.0 where the row's feedback list is non-empty
    (first padded slot >= 0)."""
    return jnp.asarray((np.asarray(padded_fb)[:n_rows, 0] >= 0).astype(np.float32))


def _pad_rows(x: np.ndarray, multiple: int, fill) -> np.ndarray:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    return np.concatenate([x, np.full((pad,) + x.shape[1:], fill, dtype=x.dtype)], axis=0)


class ALS(MatrixFactorization):
    """eALS matrix factorization (reference: model/cf/model.go:559-792).

    Hyper-parameter names/defaults match the reference's SetParams
    (model/cf/model.go:578-586): ``alpha`` is the missing-entry weight.
    """

    name = "als"

    def __init__(self, params: Params | dict | None = None) -> None:
        super().__init__(params)
        p = self.params
        self.n_factors = p.get_int(N_FACTORS, 16)
        self.n_epochs = p.get_int(N_EPOCHS, 50)
        self.reg = p.get_float(REG, 0.06)
        self.init_mean = p.get_float(INIT_MEAN, 0.0)
        self.init_stddev = p.get_float(INIT_STDDEV, 0.1)
        self.alpha = p.get_float(ALPHA, 0.001)
        self.block = p.get_int("solve_block", 256)

    def fit(self, train: Dataset, test: Dataset, config: FitConfig | None = None) -> Score:
        config = config or FitConfig()
        self.init(train, seed=config.seed)
        n_users, n_items = train.count_users(), train.count_items()
        block = min(self.block, max(n_users, 1), max(n_items, 1))

        eval_cands = build_eval_candidates(test, train, config.candidates)

        p, q = self.user_factors, self.item_factors
        mesh = getattr(config, "mesh", None)
        use_catalog = (
            mesh is not None and mesh.size > 1
            and getattr(config, "shard_table", False)
        )
        p_pad = None
        if use_catalog:
            # catalog-sharded epoch (SURVEY §2.7): BOTH factor tables stay
            # row-sharded between half-epochs; the alpha-weighted Gram is a
            # psum of shard-local k×k partials (parallel/catalog.py)
            from ..parallel.catalog import (
                make_catalog_sharded_als_epoch,
                shard_catalog_als_inputs,
            )

            p_pad, q, user_fb, item_fb, user_mask, item_mask, _, _ = (
                shard_catalog_als_inputs(
                    mesh, p, q,
                    train.padded_user_positives().padded,
                    train.padded_item_positives().padded,
                    block,
                )
            )
            sharded_epoch = make_catalog_sharded_als_epoch(
                mesh, block, self.alpha, self.reg
            )
        elif mesh is not None and mesh.size > 1:
            # sharded epoch: user/item rows sharded over the mesh, one tiled
            # all_gather per half-epoch (parallel/sharded.py)
            from ..parallel.sharded import make_sharded_als_epoch, shard_als_inputs

            q, user_fb, item_fb, user_mask, item_mask, _, _ = shard_als_inputs(
                mesh,
                q,
                train.padded_user_positives().padded,
                train.padded_item_positives().padded,
                block,
            )
            sharded_epoch = make_sharded_als_epoch(mesh, block, self.alpha, self.reg)
        else:
            sharded_epoch = None
            user_fb = jnp.asarray(_pad_rows(train.padded_user_positives().padded, block, -1))
            item_fb = jnp.asarray(_pad_rows(train.padded_item_positives().padded, block, -1))
            # Gram masks: feedback-less rows stay out of the alpha term
            # (reference model/cf/model.go:646-659)
            user_mask = _has_feedback_mask(user_fb, n_users)
            item_mask = _has_feedback_mask(item_fb, n_items)
        metrics = evaluate_mf(p, q[:n_items], *eval_cands, config.top_k)
        history = [(0, metrics["NDCG"])]
        logger.info("fit als 0/%d NDCG@%d=%.4f", self.n_epochs, config.top_k, metrics["NDCG"])

        for epoch in range(1, self.n_epochs + 1):
            t0 = time.time()
            if use_catalog:
                p_pad, q = sharded_epoch(
                    p_pad, q, user_fb, item_fb, user_mask, item_mask
                )
                p = p_pad[:n_users]
            elif sharded_epoch is not None:
                p, q = sharded_epoch(q, user_fb, item_fb, user_mask, item_mask)
                p = p[:n_users]
            else:
                p = _als_solve_side(
                    q, user_fb, block=block, alpha=self.alpha, reg=self.reg,
                    other_mask=item_mask,
                )[:n_users]
                q = _als_solve_side(
                    p, item_fb, block=block, alpha=self.alpha, reg=self.reg,
                    other_mask=user_mask,
                )[:n_items]
            if (config.verbose and epoch % config.verbose == 0) or epoch == self.n_epochs:
                metrics = evaluate_mf(p, q[:n_items], *eval_cands, config.top_k)
                history.append((epoch, metrics["NDCG"]))
                logger.info(
                    "fit als %d/%d fit=%.2fs NDCG@%d=%.4f P@%d=%.4f R@%d=%.4f",
                    epoch, self.n_epochs, time.time() - t0,
                    config.top_k, metrics["NDCG"], config.top_k,
                    metrics["Precision"], config.top_k, metrics["Recall"],
                )
                if config.patience > 0 and epoch > config.patience:
                    best_epoch = max(history, key=lambda t: t[1])[0]
                    if best_epoch <= epoch - config.patience:
                        logger.info("early stopping at epoch %d (best %d)", epoch, best_epoch)
                        break
        self.user_factors, self.item_factors = p, q[:n_items]
        metrics = evaluate_mf(p, q[:n_items], *eval_cands, config.top_k)
        return Score(ndcg=metrics["NDCG"], precision=metrics["Precision"], recall=metrics["Recall"])
