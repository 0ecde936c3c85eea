"""Entrypoints for the three node roles.

Covers the reference's cmd/gorse-master, cmd/gorse-server, cmd/gorse-worker:
a master process running the training loop + dashboard, stateless REST
server processes, and offline-pipeline worker processes — all pointed at the
master over HTTP and at shared store URLs.
"""

from __future__ import annotations

import argparse
import os
import logging
import threading


def _logging():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")


def master_main() -> None:
    from ..serve.dashboard import MasterRestServer
    from ..serve.master import Master
    from ..storage.cache import open_cache_store_from_config
    from ..storage.object import open_blob_store_from_config
    from ..storage.data import open_data_store_from_config
    from ..storage.meta import MetaStore
    from ..utils.config import Config, ConfigWatcher, default_config, load_config

    parser = argparse.ArgumentParser(prog="gorse-tpu-master")
    from .. import __version__

    parser.add_argument("--version", action="version", version=f"gorse-tpu-master {__version__}")
    parser.add_argument("--config", help="TOML config path")
    parser.add_argument("--host", default=None)
    parser.add_argument("--port", type=int, default=None)
    args = parser.parse_args()
    _logging()
    config = load_config(args.config) if args.config else default_config()
    from ..utils.tracing import configure_from

    configure_from(config)
    data = open_data_store_from_config(config.database)
    cache = open_cache_store_from_config(config.database)
    blob = open_blob_store_from_config(
        config.blob, config.database.blob_store, "/tmp/gorse_tpu_blobs"
    )
    meta = MetaStore(config.database.meta_store)
    vectors = None
    if config.database.vector_store:
        from ..storage.vectors import open_vector_store

        vectors = open_vector_store(config.database.vector_store)
    master = Master(config, data, cache, blob, meta, vector_store=vectors)
    rest = MasterRestServer(master, api_key=config.server.api_key)
    rest.serve(args.host or config.master.http_host, args.port or config.master.http_port)
    # gRPC control plane: meta/progress/blob + storage proxy for node-local
    # stores (reference: master/master.go:371-393), mTLS per config.
    from ..protocol import serve_master_grpc

    tls = None
    if config.master.ssl_mode:
        from ..utils.tls import TLSConfig

        tls = TLSConfig(config.master.ssl_ca, config.master.ssl_cert, config.master.ssl_key)
    local = config.database.data_store.startswith(("memory://", "sqlite://"))
    # keep a reference — the grpc.Server stops when garbage-collected
    grpc_server, _grpc_port = serve_master_grpc(
        master,
        blob,
        host=config.master.host,
        port=config.master.port,
        tls=tls,
        data_store=data if local else None,
        cache_store=cache if local else None,
    )
    master.serve_background()
    if args.config:
        def on_change(new_cfg):
            master.config.recommend = new_cfg.recommend
            master.trigger()

        ConfigWatcher(args.config, on_change).start()
    threading.Event().wait()


def server_main() -> None:
    from ..serve.nodes import ServerNode

    # flag surface mirrors cmd/gorse-server (--master-host/--master-port/
    # --http-host/--http-port); --master URL kept as a shorthand
    parser = argparse.ArgumentParser(prog="gorse-tpu-server")
    from .. import __version__

    parser.add_argument("--version", action="version", version=f"gorse-tpu-server {__version__}")
    parser.add_argument("--api-key", default=os.environ.get("GORSE_ADMIN_API_KEY", ""),
                        help="master admin API key for /api/admin sync")
    parser.add_argument("--master", default="")
    parser.add_argument("--master-host", default="127.0.0.1")
    parser.add_argument("--master-port", type=int, default=8088)
    parser.add_argument("--http-host", "--host", dest="http_host", default="127.0.0.1")
    parser.add_argument("--http-port", "--port", dest="http_port", type=int, default=8087)
    args = parser.parse_args()
    _logging()
    master_url = args.master or f"http://{args.master_host}:{args.master_port}"
    node = ServerNode(master_url, api_key=args.api_key)
    node.serve(args.http_host, args.http_port)
    threading.Event().wait()


def worker_main() -> None:
    from ..serve.nodes import WorkerNode

    parser = argparse.ArgumentParser(prog="gorse-tpu-worker")
    from .. import __version__

    parser.add_argument("--version", action="version", version=f"gorse-tpu-worker {__version__}")
    parser.add_argument("--api-key", default=os.environ.get("GORSE_ADMIN_API_KEY", ""),
                        help="master admin API key for /api/admin sync")
    parser.add_argument("--master", default="")
    parser.add_argument("--master-host", default="127.0.0.1")
    parser.add_argument("--master-port", type=int, default=8088)
    parser.add_argument("--http-host", dest="http_host", default="127.0.0.1")
    parser.add_argument("--http-port", dest="http_port", type=int, default=0)
    parser.add_argument("--meta-timeout", type=float, default=10.0)
    args = parser.parse_args()
    _logging()
    master_url = args.master or f"http://{args.master_host}:{args.master_port}"
    node = WorkerNode(master_url, meta_timeout=args.meta_timeout, api_key=args.api_key)
    if args.http_port:
        node.serve_http(args.http_host, args.http_port)
    node.serve()
