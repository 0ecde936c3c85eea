"""Reference-strength accuracy gates on REAL datasets — auto-activating.

These are the literal analogs of the reference's CI accuracy thresholds
(model/cf/model_test.go:35-48,93-104 and model/ctr/model_test.go:35-48),
runnable the moment the datasets are present: mount gorse's preprocessed
zips via ``GORSE_TPU_DATASET_MIRROR=file:///path/to/zips`` (or pre-extract
into ``GORSE_TPU_DATASET_DIR``), and every gate below activates. Without
data they skip — this environment has no network egress
(BASELINE.md: the reference downloads these in CI,
.github/workflows/build_test.yml:91-107).

Raw MovieLens exports also work: convert with
``gorse_tpu.data.registry.convert_movielens_ncf`` first.
"""

import pytest

from gorse_tpu.data.loaders import load_built_in, load_built_in_ctr
from gorse_tpu.data.registry import built_in_available
from gorse_tpu.models import BPR, FitConfig, Params
from gorse_tpu.models.als import ALS
from gorse_tpu.models.fm import AFM

needs = lambda name: pytest.mark.skipif(  # noqa: E731
    not built_in_available(name), reason=f"dataset {name} not mounted"
)


@needs("ml-1m")
def test_bpr_ml1m_ndcg_reference_gate():
    """model/cf/model_test.go:35-48: BPR ml-1m NDCG@10 = 0.36 ± 0.01."""
    train, test = load_built_in("ml-1m")
    model = BPR(Params(n_factors=8, n_epochs=30, lr=0.05, reg=0.01, init_stddev=0.001))
    score = model.fit(train, test, FitConfig(verbose=5, candidates=100, top_k=10))
    assert score.ndcg > 0.36 - 0.01, f"NDCG@10 {score.ndcg} below reference gate"


@needs("ml-1m")
def test_eals_ml1m_ndcg_reference_gate():
    """model/cf/model_test.go:93-104: eALS ml-1m NDCG@10 = 0.36 ± 0.01."""
    train, test = load_built_in("ml-1m")
    model = ALS(Params(n_factors=8, n_epochs=30, reg=0.015, alpha=0.05, init_stddev=0.001))
    score = model.fit(train, test, FitConfig(verbose=5, candidates=100, top_k=10))
    assert score.ndcg > 0.36 - 0.01, f"NDCG@10 {score.ndcg} below reference gate"


@needs("pinterest-20")
def test_bpr_pinterest_ndcg_archived_gate():
    """model/cf/model_test.go:90 (archived): BPR pinterest-20 NDCG@10 ≈ 0.53."""
    train, test = load_built_in("pinterest-20")
    model = BPR(Params(n_factors=8, n_epochs=50, lr=0.05, reg=0.01, init_stddev=0.001))
    score = model.fit(train, test, FitConfig(verbose=10, candidates=100, top_k=10))
    assert score.ndcg > 0.53 - 0.01, f"NDCG@10 {score.ndcg} below archived gate"


@needs("frappe")
def test_afm_frappe_accuracy_reference_gate():
    """model/ctr/model_test.go:35-48: AFM frappe accuracy ≥ 0.919 − 0.01."""
    train, test = load_built_in_ctr("frappe")
    model = AFM(Params(n_factors=8, n_epochs=10, lr=0.01, reg=1e-4, batch_size=1024))
    score = model.fit(train, test, FitConfig(verbose=1))
    assert score.accuracy > 0.919 - 0.01, f"accuracy {score.accuracy} below gate"


@needs("criteo")
def test_afm_criteo_accuracy_reference_gate():
    """model/ctr/model_test.go:78-91: AFM criteo-sample accuracy = 0.77 ± 0.025."""
    train, test = load_built_in_ctr("criteo")
    model = AFM(Params(n_factors=8, n_epochs=10, lr=0.01, reg=1e-4, batch_size=1024))
    score = model.fit(train, test, FitConfig(verbose=1))
    assert score.accuracy > 0.77 - 0.025, f"accuracy {score.accuracy} below gate"
