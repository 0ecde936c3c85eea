from .in_one import InOneNode
from .master import Master
from .progress import ProgressTracker
from .rest import RestServer
from .worker import Worker, rendezvous_owner

__all__ = [
    "InOneNode",
    "Master",
    "ProgressTracker",
    "RestServer",
    "Worker",
    "rendezvous_owner",
]
