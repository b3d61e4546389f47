"""ctypes binding for the native accessor library (native/libxsqueezeit_tpu.so).

The native library is the C-linkage integration surface for third-party
tools (the reference exports libxsqueezeit.a consumed by e.g. SHAPEIT4);
this binding lets Python tests validate it against the pure-Python decoder
and gives a zero-JAX decode path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libxsqueezeit_tpu.so")


def build_native(force: bool = False) -> str:
    """Build the native library if needed; returns its path."""
    src = os.path.join(_LIB_DIR, "xsi_accessor.cpp")
    if force or not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)):
        subprocess.run(["make", "-C", _LIB_DIR, "libxsqueezeit_tpu.so"],
                       check=True, capture_output=True)
    return _LIB_PATH


class NativeAccessor:
    def __init__(self, xsi_path: str):
        lib = ctypes.CDLL(build_native())
        lib.xsi_open.restype = ctypes.c_void_p
        lib.xsi_open.argtypes = [ctypes.c_char_p]
        lib.xsi_close.argtypes = [ctypes.c_void_p]
        for name, res in [("xsi_num_samples", ctypes.c_uint64),
                          ("xsi_num_variants", ctypes.c_uint64),
                          ("xsi_num_records", ctypes.c_uint64),
                          ("xsi_version", ctypes.c_uint32),
                          ("xsi_ploidy", ctypes.c_uint32)]:
            fn = getattr(lib, name)
            fn.restype = res
            fn.argtypes = [ctypes.c_void_p]
        lib.xsi_sample_name.restype = ctypes.c_char_p
        lib.xsi_sample_name.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.xsi_next_record.argtypes = [ctypes.c_void_p]
        lib.xsi_record_n_allele.argtypes = [ctypes.c_void_p]
        lib.xsi_record_bm.argtypes = [ctypes.c_void_p]
        lib.xsi_get_genotypes.restype = ctypes.c_int64
        lib.xsi_get_genotypes.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t]
        lib.xsi_fill_genotypes_bm.restype = ctypes.c_int64
        lib.xsi_fill_genotypes_bm.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t]
        lib.xsi_last_error.restype = ctypes.c_char_p
        self._lib = lib
        self._f = lib.xsi_open(xsi_path.encode())
        if not self._f:
            raise OSError(lib.xsi_last_error().decode())
        self.n_samples = lib.xsi_num_samples(self._f)
        self._buf = np.zeros(self.n_samples * 2, np.int32)

    def close(self):
        if self._f:
            self._lib.xsi_close(self._f)
            self._f = None

    def sample_name(self, i: int) -> str:
        return self._lib.xsi_sample_name(self._f, i).decode()

    def __iter__(self):
        lib = self._lib
        ptr = self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        while True:
            rc = lib.xsi_next_record(self._f)
            if rc == 0:
                return
            if rc < 0:
                raise OSError(lib.xsi_last_error().decode())
            n = lib.xsi_get_genotypes(self._f, ptr, self._buf.shape[0])
            if n < 0:
                raise OSError(lib.xsi_last_error().decode())
            yield (lib.xsi_record_n_allele(self._f), self._buf[:n].copy())

    def fill_genotypes_bm(self, bm: int, n_allele: int) -> np.ndarray:
        ptr = self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        n = self._lib.xsi_fill_genotypes_bm(self._f, bm, n_allele, ptr,
                                            self._buf.shape[0])
        if n < 0:
            raise OSError(self._lib.xsi_last_error().decode())
        return self._buf[:n].copy()
