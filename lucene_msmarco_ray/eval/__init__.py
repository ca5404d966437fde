from .metrics import evaluate_run, macro_averages, per_query_metrics

__all__ = ["evaluate_run", "macro_averages", "per_query_metrics"]
