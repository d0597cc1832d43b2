from . import asof, decimate

__all__ = ["asof", "decimate"]
