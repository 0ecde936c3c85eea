"""The all-in-one node: master + worker + server in a single process.

Covers the reference's cmd/gorse-in-one (main.go:56-92): standalone mode
wiring the training loop, the offline pipeline, and the REST frontend around
shared in-process stores. This is both the easiest deployment and the
integration-test harness (the reference's client/ tests drive a compose
cluster; here the in-one node plays that role in-process).
"""

from __future__ import annotations

import logging
import tempfile
import threading

from ..storage.object import open_blob_store_from_config
from ..storage.cache import open_cache_store_from_config
from ..storage.data import open_data_store_from_config
from ..storage.meta import MetaStore
from ..utils.config import Config, default_config, load_config
from .master import Master
from .worker import Worker

logger = logging.getLogger(__name__)


class InOneNode:
    def __init__(self, config: Config | None = None, workdir: str | None = None) -> None:
        self.config = config or Config()
        from ..utils.tracing import configure_from

        configure_from(self.config)
        self.workdir = workdir or tempfile.mkdtemp(prefix="gorse_tpu_")
        self.data = open_data_store_from_config(self.config.database)
        self.cache = open_cache_store_from_config(self.config.database)
        self.blob = open_blob_store_from_config(
            self.config.blob,
            self.config.database.blob_store,
            f"{self.workdir}/blobs",
        )
        self.meta = MetaStore(self.config.database.meta_store)
        self.vectors = None
        if self.config.database.vector_store:
            from ..storage.vectors import open_vector_store

            self.vectors = open_vector_store(self.config.database.vector_store)
        self.master = Master(
            self.config, self.data, self.cache, self.blob, self.meta,
            vector_store=self.vectors,
        )
        self.worker = Worker(self.config, self.data, self.cache, self.blob, node_id="in-one")
        from .dashboard import MasterRestServer

        self.rest = MasterRestServer(self.master, api_key=self.config.server.api_key)
        self._httpd = None
        self._stop = threading.Event()
        self._loop_thread: threading.Thread | None = None

    # --------------------------------------------------------------- runs

    def seed_playground(self, n_users: int = 100, n_items: int = 200, seed: int = 0) -> None:
        """Seed demo data (reference: --playground downloads the GitRec
        corpus, cmd/gorse-in-one/main.go:56-92; offline here, a low-rank
        synthetic catalog plays that role). The playground exists to demo
        training, so it opts into CF when the hard default left it off."""
        if self.config.recommend.collaborative.type == "none":
            self.config.recommend.collaborative.type = "mf"
        import numpy as np

        from ..data import synthetic_cf
        from ..storage.types import Feedback, Item, User

        data = synthetic_cf(n_users=n_users, n_items=n_items, rank=8, density=0.06, seed=seed)
        genres = ["ai", "web", "db", "infra", "mobile"]
        rng = np.random.default_rng(seed)
        self.data.insert_items(
            [
                Item(
                    f"repo{i}",
                    categories=[genres[int(rng.integers(len(genres)))]],
                    timestamp=float(rng.integers(1, 10**6)),
                    labels=[genres[int(rng.integers(len(genres)))]],
                )
                for i in range(n_items)
            ]
        )
        self.data.insert_users([User(f"user{u}") for u in range(n_users)])
        fbs = []
        for u in range(n_users):
            for slot, i in enumerate(data.user_feedback[u]):
                fbs.append(
                    Feedback("star", f"user{u}", f"repo{i}", timestamp=float(data.timestamps[u][slot]))
                )
        self.data.insert_feedback(fbs)

    def run_once(self, search: bool = False) -> dict:
        """One offline cycle: master tasks then the worker pipeline
        (reference: standalone updateRecommend master/tasks.go:1400-1454
        reuses the worker pipeline in-process)."""
        self.master.run_tasks_once(search=search)
        refreshed = self.worker.sync_and_recommend(self.master)
        return {
            "cf_model_id": self.worker.cf_model_id,
            "ctr_model_id": self.worker.ctr_model_id,
            "users_refreshed": refreshed,
        }

    def serve(self, host: str = "127.0.0.1", port: int = 8087, background_loop: bool = True):
        self._httpd = self.rest.serve(host, port)
        if background_loop:
            self._loop_thread = threading.Thread(target=self._loop, daemon=True)
            self._loop_thread.start()
        return self._httpd

    def _loop(self) -> None:
        period = self.config.recommend.collaborative.model_fit_period * 60.0
        while not self._stop.is_set():
            try:
                self.run_once()
            except Exception:  # noqa: BLE001
                logger.exception("in-one cycle failed")
            self._stop.wait(timeout=period)

    def shutdown(self) -> None:
        self._stop.set()
        self.rest.shutdown()
        if self._loop_thread:
            self._loop_thread.join(timeout=5.0)
        from ..utils.tracing import tracer

        tracer().flush()  # export trailing spans (< batch_size) on stop


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description="gorse_tpu all-in-one node")
    from .. import __version__

    parser.add_argument("--version", action="version", version=f"gorse-tpu-in-one {__version__}")
    parser.add_argument("--config", help="TOML config path")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8087)
    parser.add_argument("--workdir", default=None)
    parser.add_argument(
        "--playground", action="store_true",
        help="seed a synthetic demo catalog and train immediately",
    )
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    config = load_config(args.config) if args.config else default_config()
    node = InOneNode(config, workdir=args.workdir)
    if args.playground:
        config.recommend.data_source.positive_feedback_types = ["star"]
        node.seed_playground()  # opts into CF training
        node.run_once()
    node.serve(args.host, args.port, background_loop=True)
    logger.info("in-one node ready at http://%s:%d/api/", args.host, args.port)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        node.shutdown()


if __name__ == "__main__":
    main()
