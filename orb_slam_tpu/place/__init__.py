from . import vocabulary, database  # noqa: F401
