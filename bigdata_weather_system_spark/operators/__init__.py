from .latest import top_n_per_key, latest_per_key, dedup_latest
from .profile import mode_per_group, bucketed_profile

__all__ = [
    "top_n_per_key",
    "latest_per_key",
    "dedup_latest",
    "mode_per_group",
    "bucketed_profile",
]
