from .enumerate import with_global_seq  # noqa: F401
from .partitioning import widen  # noqa: F401
