from .rank import global_rank
from .pop import pop_per_host

__all__ = ["global_rank", "pop_per_host"]
