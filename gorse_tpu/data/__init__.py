from .dataset import Dataset
from .dict import FreqDict, Index, NOT_ID
from .loaders import load_built_in, load_ncf, synthetic_cf, synthetic_cf_powerlaw

__all__ = [
    "Dataset",
    "FreqDict",
    "Index",
    "NOT_ID",
    "load_built_in",
    "load_ncf",
    "synthetic_cf",
    "synthetic_cf_powerlaw",
]
