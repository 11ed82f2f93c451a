from .jax_setup import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
