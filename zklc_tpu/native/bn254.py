"""ctypes loader for the BN254 curve/scalar-field library (libzklcbn254.so).

Separate from libzklc.so so the Groth16 stage's heavy template code doesn't
slow the main library's rebuilds.  All boundary values are 4x u64
little-endian limbs in standard form (see bn254_curve.cpp header).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SO_PATH = os.path.join(HERE, "libzklcbn254.so")
SRC = os.path.join(HERE, "bn254_curve.cpp")

_lib = None
available = False


def _build() -> bool:
    env = dict(os.environ, ZKLC_NATIVE="0")
    try:
        subprocess.run([sys.executable,
                        os.path.join(HERE, "gen_bn254_constants.py")],
                       check=True, capture_output=True, env=env)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-fopenmp", SRC, "-o", SO_PATH],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load():
    global _lib, available
    if os.environ.get("ZKLC_NATIVE", "1") == "0":
        return
    if (not os.path.exists(SO_PATH)
            or os.path.getmtime(SO_PATH) < os.path.getmtime(SRC)):
        if not _build():
            return
    try:
        lib = ctypes.CDLL(SO_PATH)
    except OSError:
        return
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    for name, args in [
        ("bn254_g1_msm", [u64p, u64p, i64, u64p]),
        ("bn254_g2_msm", [u64p, u64p, i64, u64p]),
        ("bn254_g1_fixed_msm", [u64p, u64p, i64, u64p]),
        ("bn254_g2_fixed_msm", [u64p, u64p, i64, u64p]),
        ("bn254_fr_ntt", [u64p, i64, i64]),
        ("bn254_fr_vec_mul", [u64p, u64p, u64p, i64]),
        ("bn254_fr_vec_sub", [u64p, u64p, u64p, i64]),
        ("bn254_fr_vec_scale_powers", [u64p, u64p, u64p, i64]),
        ("bn254_r1cs_matvec", [i64p, i64p, u64p, u64p, i64, u64p]),
        ("bn254_fr_to_mont_vec", [u64p, i64]),
        ("bn254_fr_from_mont_vec", [u64p, i64]),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = args
        fn.restype = None
    _lib = lib
    available = True


_load()


# -- numpy-friendly wrappers --------------------------------------------------

def _u64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def ints_to_limbs(xs) -> np.ndarray:
    """list[int] -> (n, 4) uint64 little-endian limb array."""
    out = np.zeros((len(xs), 4), dtype=np.uint64)
    for i, x in enumerate(xs):
        x = int(x)
        for j in range(4):
            out[i, j] = (x >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
    return out


def limbs_to_ints(a: np.ndarray) -> list:
    a = a.reshape(-1, 4)
    return [int(a[i, 0]) | (int(a[i, 1]) << 64) | (int(a[i, 2]) << 128)
            | (int(a[i, 3]) << 192) for i in range(a.shape[0])]


def g1_msm(bases: np.ndarray, scalars: np.ndarray):
    """bases (n, 8) u64, scalars (n, 4) u64 -> (x, y) ints or None (inf)."""
    n = bases.shape[0]
    out = np.zeros(8, dtype=np.uint64)
    _lib.bn254_g1_msm(_u64p(np.ascontiguousarray(bases)),
                      _u64p(np.ascontiguousarray(scalars)), n, _u64p(out))
    vals = limbs_to_ints(out)
    if vals[0] == 0 and vals[1] == 0:
        return None
    return (vals[0], vals[1])


def g2_msm(bases: np.ndarray, scalars: np.ndarray):
    n = bases.shape[0]
    out = np.zeros(16, dtype=np.uint64)
    _lib.bn254_g2_msm(_u64p(np.ascontiguousarray(bases)),
                      _u64p(np.ascontiguousarray(scalars)), n, _u64p(out))
    v = limbs_to_ints(out)
    if all(x == 0 for x in v):
        return None
    return ((v[0], v[1]), (v[2], v[3]))


def g1_fixed_msm(base, scalars: np.ndarray) -> np.ndarray:
    """base (x,y) ints; scalars (n,4) -> (n,8) affine points."""
    n = scalars.shape[0]
    b = ints_to_limbs([base[0], base[1]]).reshape(-1)
    out = np.zeros((n, 8), dtype=np.uint64)
    _lib.bn254_g1_fixed_msm(_u64p(b), _u64p(np.ascontiguousarray(scalars)),
                            n, _u64p(out))
    return out


def g2_fixed_msm(base, scalars: np.ndarray) -> np.ndarray:
    n = scalars.shape[0]
    b = ints_to_limbs([base[0][0], base[0][1],
                       base[1][0], base[1][1]]).reshape(-1)
    out = np.zeros((n, 16), dtype=np.uint64)
    _lib.bn254_g2_fixed_msm(_u64p(b), _u64p(np.ascontiguousarray(scalars)),
                            n, _u64p(out))
    return out


def fr_ntt(vec: np.ndarray, log_n: int, inverse: bool) -> None:
    _lib.bn254_fr_ntt(_u64p(vec), log_n, 1 if inverse else 0)


def fr_vec_mul(x, y, out):
    _lib.bn254_fr_vec_mul(_u64p(x), _u64p(y), _u64p(out), x.shape[0])


def fr_vec_sub(x, y, out):
    _lib.bn254_fr_vec_sub(_u64p(x), _u64p(y), _u64p(out), x.shape[0])


def fr_vec_scale_powers(x, s0: int, step: int):
    s = ints_to_limbs([s0]).reshape(-1)
    st = ints_to_limbs([step]).reshape(-1)
    _lib.bn254_fr_vec_scale_powers(_u64p(x), _u64p(s), _u64p(st),
                                   x.shape[0])


def r1cs_matvec(indptr, indices, coeffs_mont, z_mont, out):
    _lib.bn254_r1cs_matvec(_i64p(indptr), _i64p(indices),
                           _u64p(coeffs_mont), _u64p(z_mont),
                           indptr.shape[0] - 1, _u64p(out))


def fr_to_mont_vec(x):
    _lib.bn254_fr_to_mont_vec(_u64p(x), x.reshape(-1, 4).shape[0])


def fr_from_mont_vec(x):
    _lib.bn254_fr_from_mont_vec(_u64p(x), x.reshape(-1, 4).shape[0])
