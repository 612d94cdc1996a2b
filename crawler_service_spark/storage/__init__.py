from .catalog import ManifestCatalog  # noqa: F401
