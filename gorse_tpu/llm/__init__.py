from .client import OpenAIClient, parse_array_from_completion, strip_think
from .mock import MockOpenAIServer, hash_embedding

__all__ = [
    "OpenAIClient",
    "parse_array_from_completion",
    "strip_think",
    "MockOpenAIServer",
    "hash_embedding",
]
