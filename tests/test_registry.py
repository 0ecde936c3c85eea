"""Dataset registry: mirror fetch, checksum verify, unzip guard, converters.

Reference behavior covered: model/built_in.go:113-130 (locate/download-if-
absent), :133-204 (download + unzip); dataset/dataset.go:426-493 (NCF format
with per-user test negatives); plus the hardening the reference lacks
(sha256 verification, zip path-traversal guard) since our mirror is
user-provided rather than a trusted CDN.
"""

import hashlib
import os
import zipfile
from pathlib import Path

import numpy as np
import pytest

from gorse_tpu.data import loaders
from gorse_tpu.data.registry import (
    DatasetIntegrityError,
    built_in_available,
    convert_movielens_ncf,
    locate_built_in,
)

TRAIN = "0\t0\n0\t1\n1\t0\n1\t2\n2\t1\n2\t2\n3\t0\n3\t1\n"
TEST = "(0,2)\t3\t4\n(1,1)\t3\t4\n(2,0)\t3\t4\n(3,2)\t4\t3\n"


@pytest.fixture()
def mirror(tmp_path, monkeypatch):
    """A file:// mirror holding ml-100k.zip + sha256 sidecar, and an empty
    dataset cache dir."""
    mdir = tmp_path / "mirror"
    cache = tmp_path / "cache"
    mdir.mkdir(), cache.mkdir()
    zpath = mdir / "ml-100k.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("ml-100k/train.txt", TRAIN)
        z.writestr("ml-100k/test.txt", TEST)
    digest = hashlib.sha256(zpath.read_bytes()).hexdigest()
    (mdir / "ml-100k.zip.sha256").write_text(f"{digest}  ml-100k.zip\n")
    monkeypatch.setenv("GORSE_TPU_DATASET_MIRROR", mdir.as_uri())
    monkeypatch.setenv("GORSE_TPU_DATASET_DIR", str(cache))
    return mdir, cache


def test_locate_fetches_and_caches(mirror):
    mdir, cache = mirror
    train_p, test_p = locate_built_in("ml-100k", "ncf")
    assert train_p.read_text() == TRAIN
    # second locate must not refetch: poison the mirror and call again
    (mdir / "ml-100k.zip").unlink()
    train_p2, _ = locate_built_in("ml-100k", "ncf")
    assert train_p2 == train_p


def test_checksum_mismatch_rejected(mirror, monkeypatch):
    mdir, cache = mirror
    (mdir / "ml-100k.zip.sha256").write_text("0" * 64 + "\n")
    with pytest.raises(DatasetIntegrityError, match="sha256 mismatch"):
        locate_built_in("ml-100k", "ncf")
    # nothing extracted on failure
    assert not (cache / "ml-100k" / "train.txt").exists()


def test_zip_traversal_rejected(mirror):
    mdir, cache = mirror
    zpath = mdir / "ml-100k.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("../evil.txt", "pwned")
    digest = hashlib.sha256(zpath.read_bytes()).hexdigest()
    (mdir / "ml-100k.zip.sha256").write_text(digest + "\n")
    with pytest.raises(DatasetIntegrityError, match="escapes"):
        locate_built_in("ml-100k", "ncf")
    assert not (cache.parent / "evil.txt").exists()


def test_format_mismatch(mirror):
    with pytest.raises(ValueError, match="format"):
        locate_built_in("ml-100k", "libfm")
    with pytest.raises(KeyError):
        locate_built_in("nope", "ncf")


def test_available_predicate(mirror, monkeypatch):
    assert built_in_available("ml-100k")  # zip in mirror
    assert not built_in_available("ml-1m")  # not in mirror
    assert not built_in_available("nope")
    monkeypatch.delenv("GORSE_TPU_DATASET_MIRROR")
    assert not built_in_available("ml-100k")  # no mirror, not cached


def test_load_built_in_honors_file_negatives(mirror):
    train, test = loaders.load_built_in("ml-100k")
    assert train.count_feedback() == 8
    assert test.file_negatives is not None
    negs = test.sample_user_negatives(train, 2)
    # the file's fixed negatives, not random samples — order preserved
    assert negs[0].tolist() == [3, 4]
    assert negs[3].tolist() == [4, 3]
    # asking for more candidates than the file provides must NOT duplicate
    # negatives (duplicates double-count in ranking metrics): the returned
    # width collapses to the file's actual width
    negs5 = test.sample_user_negatives(train, 5)
    assert negs5.shape[1] == 2 and negs5[0].tolist() == [3, 4]


def test_convert_movielens_formats(tmp_path):
    # ml-1m style ratings.dat: user::item::rating::ts
    raw = tmp_path / "ratings.dat"
    lines = []
    rng = np.random.default_rng(0)
    for u in range(1, 6):
        for j, it in enumerate(rng.permutation(50)[:8]):
            lines.append(f"{u}::{it + 100}::5::{1000 + j}")
    raw.write_text("\n".join(lines) + "\n")
    train_p, test_p = convert_movielens_ncf(
        raw, "ml-1m", out_dir=tmp_path / "out", n_negatives=10
    )
    train, test = loaders.load_ncf(train_p, test_p)
    assert train.count_users() == 5
    assert train.count_feedback() == 5 * 7  # one held out per user
    assert test.count_feedback() == 5
    assert test.file_negatives is not None
    for u in range(5):
        # held-out positive is the max-timestamp item and is absent from train
        assert len(test.user_feedback[u]) == 1
        held = test.user_feedback[u][0]
        assert held not in train.user_feedback[u]
        # negatives never collide with the user's positives
        pos = set(train.user_feedback[u]) | {held}
        assert not (set(test.file_negatives[u]) & pos)
        assert len(test.file_negatives[u]) == 10

    # ml-100k style u.data: user<TAB>item<TAB>rating<TAB>ts
    raw2 = tmp_path / "u.data"
    raw2.write_text("1\t10\t3\t5\n1\t11\t4\t9\n1\t12\t5\t1\n2\t10\t2\t7\n")
    train_p2, test_p2 = convert_movielens_ncf(
        raw2, "ml-100k", out_dir=tmp_path / "out2", n_negatives=1
    )
    train2, test2 = loaders.load_ncf(train_p2, test_p2)
    # user 1: latest is item 11 (ts 9) held out; user 2 has 1 rating -> train only
    assert train2.count_feedback() == 3
    assert test2.count_feedback() == 1


def test_convert_movielens_fit_through(tmp_path):
    """End-to-end: raw ratings.dat -> converter -> NCF loader -> BPR fit with
    the file-negative eval protocol — the exact path a real ml-1m mirror
    would take (VERDICT r4 next #9), so it is known-good before one appears."""
    import jax

    from gorse_tpu.models import BPR, Params
    from gorse_tpu.models.params import FitConfig

    rng = np.random.default_rng(1)
    lines = []
    # 40 users x ~12 ratings over 60 items, timestamps ordered per user
    for u in range(1, 41):
        for j, it in enumerate(rng.permutation(60)[:12]):
            lines.append(f"{u}::{it + 1}::{rng.integers(1, 6)}::{2000 + j}")
    raw = tmp_path / "ratings.dat"
    raw.write_text("\n".join(lines) + "\n")
    train_p, test_p = convert_movielens_ncf(
        raw, "ml-tiny", out_dir=tmp_path / "out", n_negatives=20
    )
    train, test = loaders.load_ncf(train_p, test_p)
    model = BPR(Params(n_factors=8, n_epochs=10, lr=0.05, reg=0.01))
    score = model.fit(train, test, FitConfig(verbose=0, candidates=20))
    assert np.isfinite(score.ndcg) and 0.0 <= score.ndcg <= 1.0
    # with file negatives present the evaluator must use them (the NCF
    # protocol), not resample
    assert test.file_negatives is not None
