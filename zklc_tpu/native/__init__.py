"""ctypes loader for the native C++ host-kernel library (libzklc.so).

Builds on first import if the shared object is missing (g++ is part of the
baked toolchain).  Set ZKLC_NATIVE=0 to force the pure-numpy fallbacks; the
`available` flag gates every dispatch site.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SO_PATH = os.path.join(HERE, "libzklc.so")

_lib = None


def _build() -> bool:
    # The generator scripts import zklc_tpu.hash modules, which may import
    # this package back; ZKLC_NATIVE=0 in their env makes that nested
    # import skip _build(), breaking what was an infinite spawn recursion.
    env = dict(os.environ, ZKLC_NATIVE="0")
    try:
        subprocess.run([sys.executable, os.path.join(HERE, "gen_constants.py")],
                       check=True, capture_output=True, env=env)
        subprocess.run([sys.executable,
                        os.path.join(HERE, "gen_bn128_constants.py")],
                       check=True, capture_output=True, env=env)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-fopenmp",
             os.path.join(HERE, "zklc_native.cpp"), "-o", SO_PATH],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if os.environ.get("ZKLC_NATIVE", "1") == "0":
        return None
    src = os.path.join(HERE, "zklc_native.cpp")
    if (not os.path.exists(SO_PATH)
            or os.path.getmtime(SO_PATH) < os.path.getmtime(src)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(SO_PATH)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64 = ctypes.c_int64
    u64 = ctypes.c_uint64
    for name, args in [
        ("gl_add", [u64p, u64p, u64p, i64]),
        ("gl_sub", [u64p, u64p, u64p, i64]),
        ("gl_mul", [u64p, u64p, u64p, i64]),
        ("gl_mul_scalar", [u64p, u64, u64p, i64]),
        ("gl_mul_add", [u64p, u64p, u64p, u64p, i64]),
        ("gl_cumprod", [u64p, u64p, i64]),
        ("gl_batch_inverse", [u64p, u64p, i64]),
        ("gl_powers", [u64, u64p, i64]),
        ("gl_ntt", [u64p, i64, ctypes.c_int, u64]),
        ("poseidon_permute_batch", [u64p, i64]),
        ("poseidon_hash_no_pad", [u64p, i64, u64p]),
        ("poseidon_hash_leaves", [u64p, i64, i64, u64p]),
        ("poseidon_merkle_level", [u64p, u64p, i64]),
        ("bn128_permute_batch", [u64p, i64]),
        ("bn128_hash_leaves", [u64p, i64, i64, u64p]),
        ("bn128_merkle_level", [u64p, u64p, i64]),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = args
        fn.restype = None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.wit_execute.argtypes = [
        i32p, i64p, i32p, i64p, i32p, i64p, i32p,
        i32p, i32p, u64p, u64p, u8p, i64, i64]
    lib.wit_execute.restype = ctypes.c_int64
    lib.poseidon_grind.argtypes = [u64p, u64p, i64, ctypes.c_int]
    lib.poseidon_grind.restype = ctypes.c_uint64
    _lib = lib
    return lib


_lib = _load()
available = _lib is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.uint64)


def gl_binop(name: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a, b = np.broadcast_arrays(a, b)
    a, b = _c64(a), _c64(b)
    out = np.empty_like(a)
    getattr(_lib, name)(_ptr(a), _ptr(b), _ptr(out), a.size)
    return out


def gl_mul_add(a, b, c) -> np.ndarray:
    a, b, c = np.broadcast_arrays(a, b, c)
    a, b, c = _c64(a), _c64(b), _c64(c)
    out = np.empty_like(a)
    _lib.gl_mul_add(_ptr(a), _ptr(b), _ptr(c), _ptr(out), a.size)
    return out


def batch_inverse(a: np.ndarray) -> np.ndarray:
    a = _c64(a)
    out = np.empty_like(a)
    _lib.gl_batch_inverse(_ptr(a), _ptr(out), a.size)
    return out


def cumprod(a: np.ndarray) -> np.ndarray:
    a = _c64(a)
    out = np.empty_like(a)
    _lib.gl_cumprod(_ptr(a), _ptr(out), a.size)
    return out


def powers(base: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    _lib.gl_powers(ctypes.c_uint64(base), _ptr(out), n)
    return out


def ntt_rows(data: np.ndarray, log_n: int, root: int) -> np.ndarray:
    """In-place NTT over the last axis of (rows, n); returns the array."""
    data = _c64(data)
    rows = data.size >> log_n
    _lib.gl_ntt(_ptr(data), rows, log_n, ctypes.c_uint64(root))
    return data


def poseidon_permute(states: np.ndarray) -> np.ndarray:
    """states: (..., 12) -> permuted copies."""
    s = _c64(states).copy()
    _lib.poseidon_permute_batch(_ptr(s), s.size // 12)
    return s


def poseidon_hash_no_pad(inputs: np.ndarray) -> np.ndarray:
    a = _c64(inputs)
    out = np.empty(4, dtype=np.uint64)
    _lib.poseidon_hash_no_pad(_ptr(a), a.size, _ptr(out))
    return out


def poseidon_hash_leaves(rows: np.ndarray) -> np.ndarray:
    rows = _c64(rows)
    n, row_len = rows.shape
    out = np.empty((n, 4), dtype=np.uint64)
    _lib.poseidon_hash_leaves(_ptr(rows), n, row_len, _ptr(out))
    return out


def poseidon_grind(base_state: np.ndarray, buf: np.ndarray,
                   pow_bits: int) -> int:
    base_state = _c64(base_state)
    buf = _c64(buf)
    return int(_lib.poseidon_grind(_ptr(base_state), _ptr(buf),
                                   buf.size, pow_bits))


def poseidon_merkle_level(digests: np.ndarray) -> np.ndarray:
    digests = _c64(digests)
    m = digests.shape[0] // 2
    out = np.empty((m, 4), dtype=np.uint64)
    _lib.poseidon_merkle_level(_ptr(digests), _ptr(out), m)
    return out


# -- BN254-Fr Poseidon (wrap transcript) -------------------------------------

def bn128_permute_batch(states: np.ndarray) -> np.ndarray:
    """states (n, 4, 4) or (4, 4) u64 LE Fr limbs -> permuted, in place
    semantics on a copy."""
    st = _c64(states).copy()
    flat = st.reshape(-1, 16)
    _lib.bn128_permute_batch(_ptr(flat), flat.shape[0])
    return flat.reshape(st.shape)


def bn128_hash_leaves(rows: np.ndarray) -> np.ndarray:
    """rows (n, L) u64 GL values -> (n, 4) Fr limbs (HashOrNoop)."""
    rows = _c64(rows)
    n, row_len = rows.shape
    out = np.empty((n, 4), dtype=np.uint64)
    _lib.bn128_hash_leaves(_ptr(rows), n, row_len, _ptr(out))
    return out


def bn128_merkle_level(digests: np.ndarray) -> np.ndarray:
    """digests (n, 4) Fr limbs -> (n/2, 4) parent digests."""
    digests = _c64(digests)
    m = digests.shape[0] // 2
    out = np.empty((m, 4), dtype=np.uint64)
    _lib.bn128_merkle_level(_ptr(digests), _ptr(out), m)
    return out


def fr_limbs_to_int(limbs: np.ndarray) -> int:
    v = 0
    for i in range(4):
        v |= int(limbs[i]) << (64 * i)
    return v


def fr_int_to_limbs(v: int) -> np.ndarray:
    return np.array([(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)],
                    dtype=np.uint64)
