from .attention import mha, mha_xla
from .distance import cdist, cdist_diag

__all__ = ["cdist", "cdist_diag", "mha", "mha_xla"]
