"""gRPC control plane (reference: protocol/).

Messages are protoc-generated (gorse_tpu_pb2); service stubs are hand-rolled
on grpc's generic handler API since the Python grpc codegen plugin is not in
this image. See rpc.py for the Master/BlobStore services.
"""

from . import gorse_tpu_pb2 as pb  # noqa: F401
from .rpc import BlobStoreClient, MasterGrpcClient, serve_master_grpc

__all__ = ["pb", "BlobStoreClient", "MasterGrpcClient", "serve_master_grpc"]
