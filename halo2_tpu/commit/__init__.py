from .srs import ParamsKZG

__all__ = ["ParamsKZG"]
