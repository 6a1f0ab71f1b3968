from . import png

__all__ = ["png"]
