from .readers import load_star_tables, read_csv, read_parquet  # noqa: F401
from .validation import require_columns, require_nonempty  # noqa: F401
