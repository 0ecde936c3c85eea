"""Dataset layer tests (reference analog: dataset/dataset_test.go)."""

import numpy as np

from gorse_tpu.data import Dataset, synthetic_cf
from gorse_tpu.data.dict import FreqDict


def test_freq_dict():
    d = FreqDict()
    assert d.add("a") == 0
    assert d.add("b") == 1
    assert d.add("a") == 0
    assert d.count(0) == 2
    assert d.count(1) == 1
    assert d.to_number("b") == 1
    assert d.to_number("zzz") == -1
    d2 = FreqDict.from_dict(d.to_dict())
    assert d2.to_number("a") == 0 and d2.count(0) == 2


def test_add_feedback():
    d = Dataset()
    d.add_feedback("u1", "i1", 1.0)
    d.add_feedback("u1", "i2", 2.0)
    d.add_feedback("u2", "i1", 3.0)
    assert d.count_users() == 2
    assert d.count_items() == 2
    assert d.count_feedback() == 3
    assert d.user_feedback[0] == [0, 1]
    assert d.item_feedback[0] == [0, 1]


def test_from_edges_matches_incremental():
    rng = np.random.default_rng(0)
    users = rng.integers(0, 20, size=200)
    items = rng.integers(0, 30, size=200)
    d = Dataset.from_edges(users, items)
    d2 = Dataset()
    for uid in range(20):
        d2.add_user(str(uid))
    for iid in range(30):
        d2.add_item(str(iid))
    for u, i in zip(users, items):
        d2.add_feedback(str(u), str(i))
    for u in range(20):
        assert sorted(d.user_feedback[u]) == sorted(d2.user_feedback[u])
    for i in range(30):
        assert sorted(d.item_feedback[i]) == sorted(d2.item_feedback[i])
    assert d.user_dict.freqs().tolist() == d2.user_dict.freqs().tolist()


def test_split_cf_leave_one_out():
    data = synthetic_cf(n_users=50, n_items=40, density=0.2, seed=1)
    train, test = data.split_cf(seed=0)
    assert train.count_feedback() + test.count_feedback() == data.count_feedback()
    for u in range(data.count_users()):
        if data.user_feedback[u]:
            assert len(test.user_feedback[u]) == 1
            assert len(train.user_feedback[u]) == len(data.user_feedback[u]) - 1
            # test item not in train for this user
            assert test.user_feedback[u][0] not in train.user_feedback[u] or \
                data.user_feedback[u].count(test.user_feedback[u][0]) > 1


def test_split_latest():
    d = Dataset()
    d.add_feedback("u", "a", 1.0)
    d.add_feedback("u", "b", 5.0)
    d.add_feedback("u", "c", 3.0)
    train, test = d.split_latest(shots=10)
    assert test.user_feedback[0] == [d.item_dict.to_number("b")]
    assert set(train.user_feedback[0]) == {d.item_dict.to_number("a"), d.item_dict.to_number("c")}


def test_sample_user_negatives_excludes_positives():
    data = synthetic_cf(n_users=30, n_items=50, density=0.2, seed=2)
    train, test = data.split_cf(seed=0)
    negs = test.sample_user_negatives(train, 20)
    assert negs.shape == (30, 20)
    for u in range(30):
        pos = set(train.user_feedback[u]) | set(test.user_feedback[u])
        assert not (set(negs[u].tolist()) & pos)
        # negatives are distinct per user
        assert len(set(negs[u].tolist())) == 20
    # memoized
    negs2 = test.sample_user_negatives(train, 20)
    assert negs2 is negs


def test_padded_positives():
    data = synthetic_cf(n_users=10, n_items=20, density=0.3, seed=3)
    csr = data.padded_user_positives()
    assert csr.padded.shape[0] == 10
    for u in range(10):
        c = csr.counts[u]
        assert csr.padded[u, :c].tolist() == data.user_feedback[u]
        assert (csr.padded[u, c:] == -1).all()


def test_idf():
    data = synthetic_cf(n_users=30, n_items=40, density=0.2, seed=4)
    idf = data.item_idf()
    assert idf.shape == (40,)
    assert (idf >= 0).all()
