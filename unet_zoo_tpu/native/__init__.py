"""Native (C++) runtime components.

`batchstore` — mmap'd flat tensor store + multithreaded gather/prefetch
(the framework's native data-loader; see batchstore.cpp).
"""

from unet_zoo_tpu.native.store import (
    BatchStore,
    NativeBatchProvider,
    Prefetcher,
    hdf5_to_store,
    native_available,
    write_store,
)

__all__ = [
    "BatchStore",
    "Prefetcher",
    "NativeBatchProvider",
    "write_store",
    "hdf5_to_store",
    "native_available",
]
