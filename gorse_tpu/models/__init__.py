from .als import ALS
from .base import MatrixFactorization, Score, evaluate_model
from .bpr import BPR
from .params import FitConfig, Params
from .registry import create_mf_model

__all__ = [
    "ALS",
    "MatrixFactorization",
    "Score",
    "evaluate_model",
    "BPR",
    "FitConfig",
    "Params",
    "create_mf_model",
]
