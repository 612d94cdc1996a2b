from .enumerate import with_global_seq  # noqa: F401
