"""Native C++ parser tests: parity against the pure-Python parsers and a
throughput sanity check (reference analog: the C kernel tests in
common/floats/src/floats_test.c — here for the host data path)."""

import time

import numpy as np
import pytest

from gorse_tpu.native import build_csr, load_native, parse_libfm_bytes, parse_ncf_bytes

NATIVE = load_native() is not None
needs_native = pytest.mark.skipif(not NATIVE, reason="g++ unavailable")


@needs_native
def test_libfm_native_parse():
    buf = b"1 0:1 3:0.5\n-1 1:1 2:1\n0 4:2\n"
    targets, indptr, indices, values, max_label = parse_libfm_bytes(buf)
    np.testing.assert_array_equal(targets, [1.0, 0.0, 0.0])
    np.testing.assert_array_equal(indptr, [0, 2, 4, 5])
    np.testing.assert_array_equal(indices, [0, 3, 1, 2, 4])
    np.testing.assert_allclose(values, [1.0, 0.5, 1.0, 1.0, 2.0])
    assert max_label == 4


@needs_native
def test_libfm_native_matches_loader(tmp_path):
    rng = np.random.default_rng(0)
    lines = []
    for _ in range(500):
        t = rng.choice([-1, 1])
        feats = sorted(rng.choice(1000, size=rng.integers(1, 8), replace=False))
        lines.append(
            f"{t} " + " ".join(f"{k}:{rng.uniform(0.1, 2):.4f}" for k in feats)
        )
    p = tmp_path / "f.libfm"
    p.write_text("\n".join(lines) + "\n")
    from gorse_tpu.data.ctr import load_libfm_file

    d = load_libfm_file(str(p))  # native path
    assert len(d) == 500
    # spot-check row parity with Python parsing
    fields = lines[7].split()
    assert d.targets[7] == max(float(fields[0]), 0.0)
    idx = [int(tok.split(":")[0]) for tok in fields[1:]]
    assert d.features[7][0] == idx


@needs_native
def test_ncf_native_parse():
    buf = b"3\t7\t1\n12\t5\n(4,9)\t1\n"
    users, items = parse_ncf_bytes(buf)
    np.testing.assert_array_equal(users, [3, 12, 4])
    np.testing.assert_array_equal(items, [7, 5, 9])


def test_build_csr_matches_numpy():
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 50, size=2000).astype(np.int32)
    cols = rng.integers(0, 80, size=2000).astype(np.int32)
    indptr, sorted_cols = build_csr(rows, cols, 50)
    assert indptr[-1] == 2000
    for r in range(50):
        mine = sorted(sorted_cols[indptr[r]:indptr[r + 1]].tolist())
        ref = sorted(cols[rows == r].tolist())
        assert mine == ref


@needs_native
def test_native_throughput():
    rng = np.random.default_rng(2)
    lines = [
        f"1 {i % 997}:1 {(i * 7) % 997}:0.5 {(i * 13) % 997}:2" for i in range(50_000)
    ]
    buf = ("\n".join(lines) + "\n").encode()
    t0 = time.perf_counter()
    targets, indptr, indices, values, _ = parse_libfm_bytes(buf)
    dt = time.perf_counter() - t0
    assert len(targets) == 50_000 and indptr[-1] == 150_000
    # memory-bandwidth territory: well under a second for 50k rows
    assert dt < 1.0, f"native parse too slow: {dt:.3f}s"


def test_libfm_parse_bare_indices_and_junk():
    """Bare indices (no ':') must not overflow the nnz-sized buffers, and
    non-numeric tokens must not stall the parser (review finding: the count
    pass sized by ':' occurrences while the parse pass wrote per token, and
    an unparseable char spun the token loop forever)."""
    from gorse_tpu.native import load_native, parse_libfm_bytes

    if load_native() is None:
        import pytest

        pytest.skip("native library unavailable")
    # bare indices: value defaults to 1.0 (python-fallback behavior)
    targets, indptr, indices, values, max_label = parse_libfm_bytes(b"1 3 4\n0 2:0.5\n")
    assert list(indptr) == [0, 2, 3]
    assert list(indices) == [3, 4, 2]
    assert list(values) == [1.0, 1.0, 0.5]
    assert max_label == 4
    # junk tokens are skipped, negative indices rejected, parser terminates
    targets, indptr, indices, values, max_label = parse_libfm_bytes(
        b"1 a:2 5:1.5 xyz -3:9\n"
    )
    assert list(indices) == [5]
    assert list(values) == [1.5]
