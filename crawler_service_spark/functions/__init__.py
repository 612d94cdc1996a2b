from .urls import (  # noqa: F401
    canonicalize_url_col,
    canonicalize_url_py,
    ext_class_col,
    extension_col,
    host_col,
    host_py,
    path_col,
    path_py,
    url_hash_col,
)
