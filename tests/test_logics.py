"""Logics layer tests: non-personalized scorers, item-to-item engines,
MF serving index, recommender chain (reference analogs:
logics/*_test.go)."""

import numpy as np
import pytest

from gorse_tpu.data import synthetic_cf
from gorse_tpu.logics import (
    ItemToItemConfig,
    MatrixFactorizationIndex,
    NonPersonalized,
    NonPersonalizedConfig,
    Recommender,
    UserToUser,
    UserToUserConfig,
    new_item_to_item,
)
from gorse_tpu.models import BPR, FitConfig, Params
from gorse_tpu.storage import Feedback, Item, MemoryCacheStore, MemoryDataStore, Score, User
from gorse_tpu.storage import cache as ck
from gorse_tpu.utils.config import RecommendConfig


def test_non_personalized_most_popular():
    np_rec = NonPersonalized(NonPersonalizedConfig(name="popular"), n=2)
    np_rec.push(Item("i1", categories=["a"]), [Feedback("r", "u1", "i1")] * 3)
    np_rec.push(Item("i2"), [Feedback("r", "u1", "i2")] * 5)
    np_rec.push(Item("i3"), [Feedback("r", "u1", "i3")])
    np_rec.push(Item("hidden", is_hidden=True), [Feedback("r", "u", "hidden")] * 99)
    out = np_rec.pop_all()
    assert [s.id for s in out] == ["i2", "i1"]
    assert out[0].score == 5


def test_non_personalized_filter_and_categories():
    cfg = NonPersonalizedConfig(name="recent", score="item.timestamp", filter="len(feedback) > 0")
    np_rec = NonPersonalized(cfg, n=10)
    np_rec.push(Item("new", timestamp=100.0, categories=["x"]), [Feedback("r", "u", "new")])
    np_rec.push(Item("nofb", timestamp=999.0), [])  # filtered out
    out = np_rec.pop_all()
    assert [s.id for s in out] == ["new"]
    assert "x" in out[0].categories and "" in out[0].categories


def test_item_to_item_embedding():
    eng = new_item_to_item(ItemToItemConfig(name="e", type="embedding", column="embedding"), n=2)
    vecs = {"a": [0.0, 0.0], "b": [0.1, 0.0], "c": [5.0, 5.0]}
    for iid, v in vecs.items():
        eng.push(Item(iid, labels={"embedding": v}), [])
    out = dict(eng.pop_all())
    assert out["a"][0].id == "b"  # nearest neighbor
    # positive similarity 1/(1+distance), reference item_to_item.go:164
    assert 0 < out["c"][0].score <= 1
    assert out["a"][0].score > out["c"][0].score  # nearer pair scores higher


def test_item_to_item_tags_and_users_and_auto():
    items = [
        Item("a", labels=["x", "y"]),
        Item("b", labels=["x", "y"]),
        Item("c", labels=["z"]),
    ]
    fb = {"a": [1, 2, 3], "b": [1, 2], "c": [9]}
    for typ in ("tags", "users", "auto"):
        eng = new_item_to_item(ItemToItemConfig(name="t", type=typ), n=2)
        for it in items:
            eng.push(it, fb[it.item_id])
        out = dict(eng.pop_all())
        assert out["a"][0].id == "b", typ  # same tags + overlapping users


def test_user_to_user_items():
    eng = UserToUser(UserToUserConfig(name="u", type="items"), n=2)
    eng.push(User("u1"), [1, 2, 3])
    eng.push(User("u2"), [1, 2, 3])
    eng.push(User("u3"), [7])
    out = dict(eng.pop_all())
    assert out["u1"][0].id == "u2"
    assert out["u1"][0].score == 1.0  # identical sets -> distance 0 -> sim 1


def test_mf_index_search(tmp_path):
    data = synthetic_cf(n_users=60, n_items=50, density=0.15, seed=5)
    train, test = data.split_cf(seed=0)
    model = BPR(Params(n_factors=8, n_epochs=10))
    model.fit(train, test, FitConfig(verbose=10, candidates=20, batch_size=128))
    index = MatrixFactorizationIndex.from_model(model)
    # a user whose ONLY rating went to the test split has no trained
    # embedding: the index must return nothing for them (predictability,
    # reference master/tasks.go:1023-1027), and their items must never
    # appear in anyone's results
    uid_pred = f"u{int(np.flatnonzero(index.user_predictable)[0])}"
    unpred = np.flatnonzero(~index.user_predictable)
    uid_unpred = f"u{int(unpred[0])}" if len(unpred) else None
    results = index.search_users([uid_pred, "missing"], n=5, use_pallas=False)
    assert len(results) == 2
    assert len(results[0]) == 5 and results[1] == []
    if uid_unpred is not None:
        assert index.search_users([uid_unpred], n=5, use_pallas=False) == [[]]
    unpred_items = {
        f"i{int(j)}" for j in np.flatnonzero(~index.item_predictable)
    }
    assert not ({x.id for x in results[0]} & unpred_items)
    # scores descending
    s = [x.score for x in results[0]]
    assert s == sorted(s, reverse=True)
    # exclusion works
    banned = [x.id for x in results[0][:2]]
    results2 = index.search_users([uid_pred], n=5, exclude=[banned], use_pallas=False)
    assert not (set(x.id for x in results2[0]) & set(banned))
    # round trip (including predictability masks)
    index.save(tmp_path / "idx")
    loaded = MatrixFactorizationIndex.load(tmp_path / "idx")
    r3 = loaded.search_users([uid_pred], n=5, use_pallas=False)
    assert [x.id for x in r3[0]] == [x.id for x in results[0]]
    np.testing.assert_array_equal(loaded.item_predictable, index.item_predictable)
    # similar users returns neighbors excluding self and untrained users
    sim = index.similar_users(uid_pred, 3)
    assert len(sim) == 3 and all(s.id != uid_pred for s in sim)
    unpred_users = {f"u{int(j)}" for j in unpred}
    assert not ({s.id for s in sim} & unpred_users)


@pytest.fixture
def chain_env():
    cfg = RecommendConfig()
    cfg.data_source.positive_feedback_types = ["like"]
    cfg.data_source.negative_feedback_types = ["hate"]
    cfg.ranker.type = "none"
    cfg.ranker.recommenders = ["collaborative"]
    cfg.fallback.recommenders = ["latest"]
    cache = MemoryCacheStore()
    data = MemoryDataStore()
    data.insert_items([Item(f"i{k}", timestamp=float(k)) for k in range(10)])
    data.insert_feedback([
        Feedback("like", "u1", "i1", timestamp=1.0),
        Feedback("hate", "u1", "i2", timestamp=2.0),
    ])
    return cfg, cache, data


def test_recommender_chain_fallback_latest(chain_env):
    cfg, cache, data = chain_env
    r = Recommender(cfg, cache, data, online=False, user_id="u1")
    out = r.recommend(limit=5)
    ids = [s.id for s in out]
    assert len(ids) == 5
    # i1 (consumed) and i2 (negative) excluded; latest first
    assert "i1" not in ids and "i2" not in ids
    assert ids[0] == "i9"
    assert not r.is_cold_start()


def test_recommender_chain_collaborative_first(chain_env):
    cfg, cache, data = chain_env
    cache.add_scores(ck.COLLABORATIVE, "u1", [
        Score("i5", 0.9), Score("i1", 0.8), Score("i6", 0.7),
    ])
    r = Recommender(cfg, cache, data, online=False, user_id="u1")
    out = r.recommend(limit=3)
    ids = [s.id for s in out]
    # i1 excluded (consumed); i5, i6 from collaborative; then latest fallback
    assert ids[0] == "i5" and ids[1] == "i6"
    assert len(ids) == 3


def test_recommender_chain_item_to_item(chain_env):
    cfg, cache, data = chain_env
    cfg.ranker.recommenders = ["item-to-item/neighbors"]
    cache.add_scores(ck.ITEM_TO_ITEM, "neighbors/i1", [
        Score("i3", 0.5), Score("i4", 0.4),
    ])
    r = Recommender(cfg, cache, data, online=False, user_id="u1")
    out, digest = r.recommend_sequential([], 10, ["item-to-item/neighbors"])
    assert [s.id for s in out] == ["i3", "i4"]


def test_recommender_chain_user_to_user(chain_env):
    cfg, cache, data = chain_env
    data.insert_feedback([
        Feedback("like", "u2", "i7", timestamp=1.0),
        Feedback("like", "u2", "i8", timestamp=1.0),
    ])
    cache.add_scores(ck.USER_TO_USER, "sim/u1", [Score("u2", 0.9)])
    r = Recommender(cfg, cache, data, online=False, user_id="u1")
    out, _ = r.recommend_sequential([], 10, ["user-to-user/sim"])
    assert {s.id for s in out} == {"i7", "i8"}


def test_recommender_ranked_cache_path(chain_env):
    cfg, cache, data = chain_env
    cfg.ranker.type = "fm"
    cache.add_scores(ck.RECOMMEND, "u1", [Score("i5", 1.0), Score("i1", 0.9)])
    r = Recommender(cfg, cache, data, online=True, user_id="u1")
    out = r.recommend(limit=1)
    assert [s.id for s in out] == ["i5"]


def test_item_to_item_aggregation_rewards_corroboration(chain_env):
    """An item similar to MORE of the user's history must outrank one
    similar to fewer — the chain SUMS per-neighbor scores, which only works
    because neighbor scores are positive similarities 1/(1+d), not
    -distance (reference: recommendItemToItem scores[id] += score,
    logics/recommend.go:265 with item_to_item.go:164)."""
    cfg, cache, data = chain_env
    data.insert_feedback([Feedback("like", "u1", "i8", timestamp=3.0)])
    # i3 is corroborated by BOTH consumed items (weak similarity each);
    # i4 by only one (slightly stronger single link)
    cache.add_scores(ck.ITEM_TO_ITEM, "neighbors/i1", [
        Score("i3", 0.4), Score("i4", 0.5),
    ])
    cache.add_scores(ck.ITEM_TO_ITEM, "neighbors/i8", [
        Score("i3", 0.4),
    ])
    r = Recommender(cfg, cache, data, online=False, user_id="u1")
    out, _ = r.recommend_sequential([], 10, ["item-to-item/neighbors"])
    by_id = {s.id: s.score for s in out}
    assert by_id["i3"] == pytest.approx(0.8) and by_id["i4"] == pytest.approx(0.5)
    assert [s.id for s in out][0] == "i3"


def test_similar_users_returns_n_despite_unpredictable_rows():
    """Regression: zeroed (instead of -inf-masked) untrained embeddings
    scored cosine 0, outranked negative-similarity real neighbors, and
    silently truncated the result below n."""
    rng = np.random.default_rng(0)
    k = 8
    uf = rng.normal(size=(6, k)).astype(np.float32)
    uf[1] = uf[0] * 0.9  # strong positive neighbor
    uf[2] = -uf[0]       # strong NEGATIVE similarity neighbors
    uf[3] = -uf[0] * 0.8
    from gorse_tpu.data.dict import FreqDict
    from gorse_tpu.logics.cf import MatrixFactorizationIndex

    ud, it = FreqDict(), FreqDict()
    for i in range(6):
        ud.add(f"u{i}")
    it.add("i0")
    pred = np.array([True, True, True, True, False, False])
    idx = MatrixFactorizationIndex(
        uf, rng.normal(size=(1, k)).astype(np.float32), ud, it,
        user_predictable=pred, item_predictable=np.array([True]),
    )
    sim = idx.similar_users("u0", 3)
    # full n returned; positive neighbor first, then the negative-cosine
    # pair (both normalize to exactly -1, tie order unspecified)
    assert len(sim) == 3 and sim[0].id == "u1"
    assert {s.id for s in sim} == {"u1", "u2", "u3"}
    assert all(s.id not in ("u4", "u5") for s in sim)
    # untrained query user -> no neighbors at all
    assert idx.similar_users("u4", 3) == []


def test_search_users_chunked_matches_unchunked():
    """The 256-row serving chunks must be invisible in the results."""
    data = synthetic_cf(n_users=300, n_items=80, density=0.2, seed=2)
    train, test = data.split_cf(seed=0)
    model = BPR(Params(n_factors=8, n_epochs=3))
    model.fit(train, test, FitConfig(verbose=3, candidates=20, batch_size=256))
    index = MatrixFactorizationIndex.from_model(model)
    uids = [f"u{i}" for i in range(300)]
    chunked = index.search_users(uids, n=5, use_pallas=False)
    assert len(chunked) == 300
    one_by_one = [
        index.search_users([u], n=5, use_pallas=False)[0] for u in uids[:10]
    ]
    for a, b in zip(chunked[:10], one_by_one):
        assert [x.id for x in a] == [x.id for x in b]
