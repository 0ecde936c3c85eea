"""ItemCache BF16 label compression + deep-size accounting tests
(reference analogs: worker/pipeline.go ItemCache, common/sizeof)."""

import numpy as np

from gorse_tpu.serve.item_cache import ItemCache, compress_labels, decompress_labels
from gorse_tpu.storage import Item, MemoryDataStore
from gorse_tpu.utils.sizeof import deep_size


def test_compress_labels_embeddings():
    labels = {
        "genre": ["action", "comedy"],
        "embedding": [0.5, -1.25, 3.0, 0.125],
        "nested": {"vec": [1.0, 2.0], "tag": "x"},
    }
    out = compress_labels(labels)
    assert out["genre"] == ["action", "comedy"]
    emb = out["embedding"]
    assert isinstance(emb, np.ndarray) and emb.dtype.itemsize == 2
    # exactly representable values survive the BF16 round trip
    assert decompress_labels(emb) == [0.5, -1.25, 3.0, 0.125]
    assert isinstance(out["nested"]["vec"], np.ndarray)
    assert compress_labels(None) is None
    assert compress_labels("s") == "s"
    # mixed lists are not embeddings
    assert compress_labels(["a", 1.0]) == ["a", 1.0]


def test_compression_halves_embedding_memory():
    vec = [float(i) / 7 for i in range(256)]
    raw = np.asarray(vec, dtype=np.float32)
    compressed = compress_labels(vec)
    assert compressed.nbytes * 2 == raw.nbytes


def test_item_cache_prefetch_and_get():
    store = MemoryDataStore()
    store.insert_items(
        [Item(f"i{k}", labels={"emb": [float(k), 1.0]}) for k in range(5)]
    )

    calls = {"batch": 0, "single": 0}
    orig_batch, orig_get = store.batch_get_items, store.get_item

    def batch(ids, **kw):
        calls["batch"] += 1
        return orig_batch(ids, **kw)

    def single(iid):
        calls["single"] += 1
        return orig_get(iid)

    store.batch_get_items, store.get_item = batch, single

    cache = ItemCache(store)
    cache.prefetch(["i0", "i1", "i2", "missing"])
    assert calls["batch"] == 1
    calls["single"] = 0  # the in-memory backend's batch_get_items loops get_item
    # cached lookups don't touch the store (missing ids cached as None too)
    for iid in ("i0", "i1", "i2", "missing"):
        cache.get(iid)
    assert calls["single"] == 0
    assert cache.get("i0").labels["emb"].dtype.itemsize == 2
    assert cache.get("missing") is None
    assert len(cache) == 3
    # uncached id falls back to a single get
    assert cache.get("i4") is not None and calls["single"] == 1
    cache.clear()
    assert len(cache) == 0


def test_deep_size():
    assert deep_size(np.zeros((100, 100), dtype=np.float32)) == 40000
    small = deep_size({"a": 1})
    big = deep_size({"a": 1, "b": np.zeros(1000, dtype=np.float32)})
    assert big > small + 3900
    # cycles terminate
    x: list = [1, 2]
    x.append(x)
    assert deep_size(x) > 0
    # shared objects counted once
    arr = np.zeros(1000, dtype=np.float32)
    assert deep_size([arr, arr]) < 2 * arr.nbytes
