from .fused import fused_logweight_logsumexp
from .fused import logsumexp_rows

__all__ = ["fused_logweight_logsumexp", "logsumexp_rows"]
