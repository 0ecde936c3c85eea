"""AFM CTR model tests: AUC gate on synthetic FM-generated data
(analog of model/ctr/model_test.go:35-91 frappe/criteo gates), scaler
behavior, embedding-column towers, and save/load parity."""

import numpy as np

from gorse_tpu.data.ctr import CTRDataset, load_libfm, synthetic_ctr
from gorse_tpu.models.fm import AFM
from gorse_tpu.models.params import FitConfig, Params
from gorse_tpu.models.scaler import AutoScaler, MinMaxScaler, RobustScaler, fit_auto_scalers


def test_afm_learns_fm_structure():
    data = synthetic_ctr(n_samples=4000, seed=0)
    train, test = data.split(0.2, seed=1)
    model = AFM(Params(n_factors=8, n_epochs=60, lr=0.01, reg=1e-4, batch_size=512))
    score = model.fit(train, test, FitConfig(verbose=20))
    assert score.auc > 0.75, f"AUC too low: {score.auc}"


def test_afm_save_load_parity(tmp_path):
    data = synthetic_ctr(n_samples=800, seed=3, numerical=True)
    train, test = data.split(0.2, seed=1)
    model = AFM(Params(n_factors=4, n_epochs=3, batch_size=256))
    model.fit(train, test, FitConfig(verbose=3))
    model.save(tmp_path / "afm")
    loaded = AFM.load(tmp_path / "afm")
    rows = [test.features[i] for i in range(10)]
    np.testing.assert_allclose(
        model.batch_predict(rows), loaded.batch_predict(rows), rtol=1e-6
    )
    assert loaded.scalers, "numerical feature scalers should persist"


def test_afm_with_embedding_column():
    rng = np.random.default_rng(0)
    data = synthetic_ctr(n_samples=600, seed=5)
    data.embedding_dims = [8]
    data.embeddings = [[rng.normal(size=8).astype(np.float32) for _ in range(len(data))]]
    train, test = data.split(0.2, seed=1)
    model = AFM(Params(n_factors=4, n_epochs=2, batch_size=128))
    score = model.fit(train, test, FitConfig(verbose=2))
    assert np.isfinite(score.auc)
    assert len(model.model_params["att"]) == 1


def test_scalers():
    mm = MinMaxScaler().fit(np.array([1.0, 3.0]))
    assert mm.transform(2.0) == 0.5
    assert MinMaxScaler().fit(np.array([2.0, 2.0])).transform(2.0) == 1  # degenerate
    rs = RobustScaler().fit(np.arange(101, dtype=np.float32))
    np.testing.assert_allclose(rs.transform(50.0), 0.0, atol=1e-6)
    # AutoScaler: non-negative -> log1p+minmax in [0, 1]
    a = AutoScaler().fit(np.array([0.0, 1.0, 10.0, 100.0], dtype=np.float32))
    assert a.use_log
    assert 0.0 <= a.transform(5.0) <= 1.0
    # with negatives -> robust path
    a2 = AutoScaler().fit(np.array([-5.0, 0.0, 5.0], dtype=np.float32))
    assert not a2.use_log


def test_fit_auto_scalers_only_numerical():
    feats = [([0, 1], [1.0, 3.5]), ([0, 1], [1.0, 2.0])]
    scalers = fit_auto_scalers(feats)
    assert 1 in scalers and 0 not in scalers


def test_libfm_roundtrip(tmp_path):
    p = tmp_path / "train.libfm"
    p.write_text("1 0:1 3:0.5\n-1 1:1 2:1\n0 4:2\n")
    q = tmp_path / "test.libfm"
    q.write_text("1 0:1 5:1\n")
    train, test = load_libfm(str(p), str(q))
    assert len(train) == 3
    assert train.targets == [1.0, 0.0, 0.0]
    assert train.features[0] == ([0, 3], [1.0, 0.5])
    assert train.num_features() == 6  # shared index covers test's max id
    assert test.num_features() == 6


def test_split_by_user_time():
    d = CTRDataset()
    for u in range(3):
        for t in range(10):
            d.add([0], [1.0], t % 2, user=u, timestamp=float(t))
    train, test = d.split_by_user_time(0.2)
    assert len(test) == 6  # 2 newest per user
    assert all(ts >= 8.0 for ts in test.timestamps)


def test_autoscaler_clamps_negative_serve_values():
    """log-mode AutoScaler must clamp negatives like the reference
    (transformer.go Log1p(max(0, v))) — not emit -inf/NaN logits."""
    import numpy as np

    from gorse_tpu.models.scaler import AutoScaler

    s = AutoScaler().fit(np.array([0.0, 1.0, 10.0, 100.0], dtype=np.float32))
    out = s.transform(np.array([-5.0, -1.0, 0.0, 10.0], dtype=np.float32))
    assert np.all(np.isfinite(out))
    assert out[0] == out[1] == out[2]  # all clamp to log1p(0)


def test_model_search_zero_trials_noop():
    """optimize_trials = 0 disables search without crashing the task."""
    from gorse_tpu.models.optimize import AFM_SPACE, ALS_SPACE, BPR_SPACE, model_search, model_type_search

    best, value, trials = model_search(lambda p: 1.0, AFM_SPACE, n_trials=0)
    assert dict(best) == {} and value == float("-inf") and trials == []
    mtype, best, value, trials = model_type_search(
        {"bpr": BPR_SPACE, "als": ALS_SPACE}, lambda t, p: 1.0, n_trials=0
    )
    assert mtype in ("bpr", "als") and dict(best) == {} and trials == []


def test_predict_padded_chunks_match_single_batch():
    """Chunked inference equals one-shot inference (criteo-scale OOM fix)."""
    import numpy as np

    from gorse_tpu.data.ctr import synthetic_ctr
    from gorse_tpu.models.fm import AFM
    from gorse_tpu.models.params import FitConfig, Params

    ctr = synthetic_ctr(n_samples=300, n_users=40, n_items=30, seed=3)
    train, test = ctr.split(0.3, seed=0)
    model = AFM(Params(n_factors=4, n_epochs=2))
    model.fit(train, test, FitConfig(verbose=0))
    pad = test.padded()
    full = np.asarray(model.predict_padded(pad.indices, pad.values, pad.embeddings))
    model.PREDICT_CHUNK = 17  # force many uneven chunks
    chunked = np.asarray(model.predict_padded(pad.indices, pad.values, pad.embeddings))
    np.testing.assert_allclose(chunked, full, rtol=1e-6, atol=1e-6)
