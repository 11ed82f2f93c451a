from .jax_setup import device_put_chunked, enable_compilation_cache

__all__ = ["device_put_chunked", "enable_compilation_cache"]
