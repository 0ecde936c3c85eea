"""Hyper-parameter search tests (reference analog: model/cf/optimize_test.go)."""

import math

import numpy as np

from gorse_tpu.data import synthetic_cf
from gorse_tpu.models import BPR, FitConfig, Params
from gorse_tpu.models.optimize import (
    BPR_SPACE,
    SearchSpace,
    TPESampler,
    Trial,
    model_search,
)


def test_tpe_beats_random_on_quadratic():
    # objective peaked at lr=0.01 in log space
    def objective(p):
        return -((math.log(p["lr"]) - math.log(0.01)) ** 2)

    space = {"lr": SearchSpace(0.001, 0.1)}
    best_tpe, val_tpe, trials = model_search(objective, space, n_trials=30, seed=0)
    assert len(trials) == 30
    # TPE should land near the optimum
    assert 0.003 < best_tpe["lr"] < 0.03, best_tpe


def test_search_space_integer_and_uniform():
    s = SearchSpace(4, 64, log=True, integer=True)
    rng = np.random.default_rng(0)
    for _ in range(20):
        v = s.sample(rng)
        assert isinstance(v, int) and 4 <= v <= 64
    u = SearchSpace(0.0, 1.0, log=False)
    assert 0.0 <= u.sample(rng) <= 1.0


def test_tpe_sampler_respects_bounds():
    space = {"reg": SearchSpace(0.001, 0.1)}
    tpe = TPESampler(space, seed=1, n_startup=2)
    trials = [
        Trial(Params(reg=0.001 * (i + 1)), value=float(i)) for i in range(12)
    ]
    for _ in range(10):
        p = tpe.suggest(trials)
        assert 0.001 <= p["reg"] <= 0.1


def test_model_search_bpr_end_to_end():
    data = synthetic_cf(n_users=80, n_items=60, density=0.15, seed=11)
    train, test = data.split_cf(seed=0)

    def objective(p):
        model = BPR(Params(n_factors=4, n_epochs=4).merged(p))
        return model.fit(train, test, FitConfig(verbose=4, candidates=20, batch_size=128)).ndcg

    best, val, trials = model_search(objective, BPR_SPACE, n_trials=3, seed=0)
    assert val > 0.0 and set(best) == {"lr", "reg", "init_stddev"}


def test_model_type_search_picks_better_type():
    from gorse_tpu.models.optimize import model_type_search

    spaces = {
        "bpr": {"lr": SearchSpace(0.001, 0.1)},
        "als": {"reg": SearchSpace(0.001, 0.1)},
    }

    # "als" dominates regardless of params; search must discover that
    def objective(mtype, params):
        base = 0.9 if mtype == "als" else 0.1
        return base + 0.01 * next(iter(params.values()))

    best_type, best, value, trials = model_type_search(spaces, objective, n_trials=12, seed=0)
    assert best_type == "als"
    assert value > 0.9
    assert len(trials) == 12
    # both types were explored during startup
    assert {t for t, _ in trials} == {"bpr", "als"}
