"""ctypes bindings for the native batch store (batchstore.cpp).

The .so is built on first use with g++ (no pybind11 in this image; plain C
ABI + ctypes). `write_store` converts numpy/HDF5 arrays into the flat
"UZBS1" format the C++ library mmaps; `NativeBatchProvider` is a drop-in
BatchProvider twin whose record gather runs on a C++ thread pool with
asynchronous double-buffered prefetch — the host-side pipeline stays off
the Python thread while the device computes (reference analog: none; its
h5py reads block the train loop, reference data/batch_provider.py:58-59).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "batchstore.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_batchstore.so")
_LIB = None
_BUILD_ERR: Optional[str] = None

# dtype code IS the itemsize (see batchstore.cpp header comment)
_SUPPORTED = {
    np.dtype(np.uint8): 1,
    np.dtype(np.int16): 2,
    np.dtype(np.float32): 4,
    np.dtype(np.int32): 4,
    np.dtype(np.float64): 8,
    np.dtype(np.int64): 8,
}


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            text=True,
        )
        return None
    except subprocess.CalledProcessError as e:  # pragma: no cover
        return e.stderr
    except FileNotFoundError:  # pragma: no cover
        return "g++ not found"


def _lib():
    global _LIB, _BUILD_ERR
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _BUILD_ERR = _build()
        if _BUILD_ERR:
            raise RuntimeError(f"batchstore build failed:\n{_BUILD_ERR}")
    lib = ctypes.CDLL(_SO)
    lib.bs_open.restype = ctypes.c_void_p
    lib.bs_open.argtypes = [ctypes.c_char_p]
    lib.bs_close.argtypes = [ctypes.c_void_p]
    lib.bs_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.bs_gather.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_int,
    ]
    lib.bs_prefetcher_new.restype = ctypes.c_void_p
    lib.bs_prefetcher_new.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
    ]
    lib.bs_prefetcher_submit.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.bs_prefetcher_wait.restype = ctypes.c_void_p
    lib.bs_prefetcher_wait.argtypes = [ctypes.c_void_p]
    lib.bs_prefetcher_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def write_store(path: str, array, dtype=None) -> str:
    """Write a (possibly h5py) array as a UZBS1 flat store.

    ``dtype``: optional cast applied chunk-wise while streaming (e.g. the
    LIDC cache stores float64 images — reference lidc_data_loader.py:92 —
    but the consumer converts to float32 anyway, so storing float32 halves
    the read traffic with bit-identical batches)."""
    arr0 = array[0:1]  # probe dtype without loading everything
    dtype = np.dtype(dtype) if dtype is not None else np.dtype(
        np.asarray(arr0).dtype
    )
    if dtype not in _SUPPORTED:
        raise ValueError(f"unsupported dtype {dtype}")
    shape = tuple(array.shape)
    with open(path, "wb") as f:
        f.write(b"UZBS1")
        f.write(bytes([dtype.itemsize, len(shape), 0]))
        f.write(np.asarray(shape, dtype=np.int64).tobytes())
        chunk = max(1, (1 << 26) // max(1, int(np.prod(shape[1:])) * dtype.itemsize))
        for i in range(0, shape[0], chunk):
            block = np.ascontiguousarray(
                np.asarray(array[i : i + chunk], dtype=dtype)
            )
            f.write(block.tobytes())
    return path


def hdf5_to_store(h5_dataset, path: str) -> str:
    return write_store(path, h5_dataset)


class BatchStore:
    """mmap'd record store with C++ parallel gather."""

    def __init__(self, path: str, dtype, nthreads: int = 4):
        self._lib = _lib()
        self._h = self._lib.bs_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open batch store {path}")
        n = ctypes.c_int64()
        rb = ctypes.c_int64()
        dims = (ctypes.c_int64 * 8)()
        nd = ctypes.c_int()
        self._lib.bs_info(self._h, ctypes.byref(n), ctypes.byref(rb), dims,
                          ctypes.byref(nd))
        self.num_records = n.value
        self.record_bytes = rb.value
        self.shape = tuple(dims[i] for i in range(nd.value))
        self.dtype = np.dtype(dtype)
        assert self.dtype.itemsize * int(np.prod(self.shape[1:])) == rb.value, (
            "dtype inconsistent with store record size"
        )
        self.nthreads = nthreads

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx),) + self.shape[1:], dtype=self.dtype)
        self._lib.bs_gather(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.c_void_p),
            self.nthreads,
        )
        return out

    def close(self):
        if self._h:
            self._lib.bs_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class Prefetcher:
    """Async double-buffered gather: submit index lists; wait() returns the
    oldest filled batch as a numpy view (valid until the next wait)."""

    def __init__(self, store: BatchStore, batch_size: int, depth: int = 3):
        self._lib = store._lib
        self._store = store
        self.batch_size = batch_size
        self._p = self._lib.bs_prefetcher_new(
            store._h, batch_size, store.nthreads, depth
        )

    def submit(self, indices: Sequence[int]) -> None:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        assert len(idx) == self.batch_size
        self._lib.bs_prefetcher_submit(
            self._p, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx)
        )

    def wait(self) -> np.ndarray:
        ptr = self._lib.bs_prefetcher_wait(self._p)
        buf = (ctypes.c_char * (self.batch_size * self._store.record_bytes)
               ).from_address(ptr)
        arr = np.frombuffer(buf, dtype=self._store.dtype)
        return arr.reshape((self.batch_size,) + self._store.shape[1:])

    def close(self):
        if self._p:
            self._lib.bs_prefetcher_free(self._p)
            self._p = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class NativeBatchProvider:
    """BatchProvider twin backed by native stores with pipelined prefetch.

    Keeps the reference sampling semantics (without replacement, sorted
    indices, random annotator pick — reference data/batch_provider.py:43-67,
    131-137) but gathers records on C++ threads one batch AHEAD of the
    consumer.
    """

    def __init__(
        self,
        image_store: BatchStore,
        label_store: BatchStore,
        indices: np.ndarray,
        batch_size: int,
        add_dummy_dimension: bool = True,
        num_labels_per_subject: int = 1,
        annotator_range: Optional[Sequence[int]] = None,
        rng: Optional[np.random.Generator] = None,
    ):
        self.X = image_store
        self.y = label_store
        self.indices = np.asarray(indices)
        self.unused_indices = self.indices.copy()
        self.batch_size = batch_size
        self.add_dummy_dimension = add_dummy_dimension
        self.num_labels_per_subject = num_labels_per_subject
        self.annotator_range = (
            list(annotator_range)
            if annotator_range is not None
            else list(range(num_labels_per_subject))
        )
        self.rng = rng if rng is not None else np.random.default_rng()
        self._px = Prefetcher(image_store, batch_size)
        self._py = Prefetcher(label_store, batch_size)
        self._pending_picks: list = []  # annotator picks, FIFO with submits
        self._primed = False

    def _sample_indices(self) -> np.ndarray:
        if len(self.unused_indices) < self.batch_size:
            self.unused_indices = self.indices
        picks = self.rng.choice(self.unused_indices, self.batch_size,
                                replace=False)
        self.unused_indices = np.setdiff1d(self.unused_indices, picks)
        return np.sort(picks)

    def _submit_next(self):
        # ALL host-RNG draws for a batch happen here, in the h5py
        # BatchProvider's per-batch order (indices, then annotator picks,
        # batch_provider.py:103,132) — the prefetcher runs one batch ahead
        # of the consumer, so deferring the annotator draw to next_batch
        # would interleave it with the NEXT batch's index draw and break
        # bit-identity with the h5py stream (pinned by
        # tests/test_training.py::test_native_loader_batches_bit_identical).
        idx = self._sample_indices()
        self._px.submit(idx)
        self._py.submit(idx)
        self._pending_picks.append(
            self.rng.choice(self.annotator_range, size=self.batch_size)
            if self.num_labels_per_subject > 1
            else None
        )

    def next_batch(self, batch_size: Optional[int] = None):
        assert batch_size is None or batch_size == self.batch_size, (
            "NativeBatchProvider has a fixed batch size"
        )
        if not self._primed:
            self._submit_next()
            self._primed = True
        self._submit_next()  # keep one batch in flight
        X = self._px.wait()
        y = self._py.wait()
        X = np.array(X, dtype=np.float32, copy=True)  # own the buffer
        y = np.array(y, copy=True)
        picks = self._pending_picks.pop(0)
        if picks is not None:
            y = np.stack([y[i, ..., a] for i, a in enumerate(picks)], axis=0)
        if self.add_dummy_dimension:
            X = np.expand_dims(X, axis=-1)
        return X, y.astype(np.int32)

    def close(self):
        self._px.close()
        self._py.close()
        self.X.close()
        self.y.close()


def train_provider_from_h5(
    data_file,
    batch_size: int,
    *,
    images: str = "train/images",
    labels: str = "train/labels",
    add_dummy_dimension: bool = True,
    num_labels_per_subject: int = 1,
    annotator_range: Optional[Sequence[int]] = None,
    rng: Optional[np.random.Generator] = None,
    image_dtype=np.float32,
) -> NativeBatchProvider:
    """Serve one HDF5 split through the native store (the Trainer's
    ``loader="native"`` path, ExperimentConfig.loader).

    The split's images/labels datasets are converted ONCE into UZBS flat
    stores cached next to the HDF5 file (rebuilt if the cache predates it);
    subsequent runs mmap them directly. Sampling semantics and the RNG call
    order equal BatchProvider's (indices draw, then annotator picks), so a
    same-seeded native provider yields the bit-identical batch stream to
    the h5py provider it replaces — only the read path changes (C++ thread
    pool, one batch prefetched ahead, vs the reference's blocking h5py
    fancy-index read, data/batch_provider.py:58-59)."""
    img_ds, lbl_ds = data_file[images], data_file[labels]
    base = data_file.filename
    img_path = f"{base}.{images.replace('/', '.')}.uzbs"
    lbl_path = f"{base}.{labels.replace('/', '.')}.uzbs"
    h5_mtime = os.path.getmtime(base)
    if not os.path.exists(img_path) or os.path.getmtime(img_path) < h5_mtime:
        write_store(img_path, img_ds, dtype=image_dtype)
    if not os.path.exists(lbl_path) or os.path.getmtime(lbl_path) < h5_mtime:
        write_store(lbl_path, lbl_ds)
    img_store = BatchStore(img_path, image_dtype)
    lbl_store = BatchStore(lbl_path, np.dtype(lbl_ds.dtype))
    return NativeBatchProvider(
        img_store,
        lbl_store,
        np.arange(img_store.num_records),
        batch_size,
        add_dummy_dimension=add_dummy_dimension,
        num_labels_per_subject=num_labels_per_subject,
        annotator_range=annotator_range,
        rng=rng,
    )
