"""Native host-side runtime: C++ batch loader + background prefetcher."""
from .native_loader import BinarySubsetCache, native_loader_available
from .prefetcher import DevicePrefetcher
