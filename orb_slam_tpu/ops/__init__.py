from . import fast, detect, patches, brief  # noqa: F401
