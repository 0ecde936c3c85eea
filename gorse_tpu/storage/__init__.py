from .blob import BlobStore
from .cache import CacheStore, MemoryCacheStore, SQLiteCacheStore, open_cache_store
from .object import (
    AzureBlobClient,
    GCSClient,
    ObjectBlobStore,
    S3Client,
    open_blob_store,
)
from .data import DataStore, MemoryDataStore, SQLiteDataStore, open_data_store
from .meta import MetaStore, Node
from .proxy import ProxyCacheStore, ProxyDataStore, ProxyVectorStore, add_storage_proxy
from .types import Feedback, Item, Score, TimeSeriesPoint, User

__all__ = [
    "AzureBlobClient",
    "BlobStore",
    "GCSClient",
    "ObjectBlobStore",
    "S3Client",
    "open_blob_store",
    "ProxyCacheStore",
    "ProxyDataStore",
    "ProxyVectorStore",
    "add_storage_proxy",
    "CacheStore",
    "MemoryCacheStore",
    "SQLiteCacheStore",
    "open_cache_store",
    "DataStore",
    "MemoryDataStore",
    "SQLiteDataStore",
    "open_data_store",
    "MetaStore",
    "Node",
    "Feedback",
    "Item",
    "Score",
    "TimeSeriesPoint",
    "User",
]
