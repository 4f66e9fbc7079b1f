from .base import Codec  # noqa: F401
