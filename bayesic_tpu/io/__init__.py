"""Native-tier IO: mmap'd ratings datasets with threaded prefetch
(C++ via ctypes, numpy fallback)."""

from .ratings import RatingsDataset, native_available, write_ratings

__all__ = ["RatingsDataset", "write_ratings", "native_available"]
