from . import host, pairing

__all__ = ["host", "pairing"]
