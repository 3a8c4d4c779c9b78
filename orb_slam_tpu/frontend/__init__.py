from . import extractor  # noqa: F401
