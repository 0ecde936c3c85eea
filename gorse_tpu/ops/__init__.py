from .metrics import auc, classification_metrics, rank_metrics

__all__ = ["auc", "classification_metrics", "rank_metrics"]
