from .fused import fused_bspline_per_event_log_bayes_factors
from .fused import fused_logweight_logsumexp
from .fused import fused_logweight_logsumexp_xla

__all__ = [
    "fused_bspline_per_event_log_bayes_factors",
    "fused_logweight_logsumexp",
    "fused_logweight_logsumexp_xla",
]
