from .cleaning import dedup_by_key, drop_null_keys, filter_not_numeric  # noqa: F401
from .windows import top_k_per_group  # noqa: F401
