from . import edges, skew

__all__ = ["edges", "skew"]
