"""Native (C++) runtime components, loaded via ctypes.

Each component compiles lazily from source on first use with the system
toolchain (g++) and caches the shared object next to the source; loading
falls back gracefully (returning None) so the pure-Python/JAX paths keep
working on hosts without a compiler.
"""

from .build import load_native_library

__all__ = ["load_native_library"]
