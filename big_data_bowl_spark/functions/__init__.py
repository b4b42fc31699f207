from . import geometry, hashing, text

__all__ = ["geometry", "hashing", "text"]
