"""ctypes bindings for the native host runtime (native/keyhunt_native.cpp).

The native library accelerates the host side of the dispatch path — BSGS
lane seeding, batch pubkey derivation, candidate hashing, baby-table
argsort — the roles `secp256k1/*.cpp` and `hash/*.cpp` play in the
reference. Every entry point has a pure-Python fallback in `keyhunt_tpu.ref`,
so the package works (slowly) without the .so; `available()` reports which
path is active.

Build: ``make -C native`` (or `ensure_built()`, which shells out to make
once and caches the result).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libkeyhunt_native.so")

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_u64p = ctypes.POINTER(ctypes.c_uint64)


@lru_cache(maxsize=1)
def _load():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.kh_version.restype = ctypes.c_uint64
    if lib.kh_version() != 1:
        return None
    lib.kh_sha256.argtypes = [_u8p, ctypes.c_uint64, _u8p]
    lib.kh_ripemd160.argtypes = [_u8p, ctypes.c_uint64, _u8p]
    lib.kh_keccak256.argtypes = [_u8p, ctypes.c_uint64, _u8p]
    lib.kh_hash160_batch.argtypes = [_u8p, ctypes.c_uint64, ctypes.c_uint64, _u8p]
    lib.kh_sha256_batch.argtypes = [_u8p, ctypes.c_uint64, ctypes.c_uint64, _u8p]
    lib.kh_xxh64.argtypes = [_u8p, ctypes.c_uint64, ctypes.c_uint64]
    lib.kh_xxh64.restype = ctypes.c_uint64
    lib.kh_ec_pubkey_batch.argtypes = [_u8p, ctypes.c_uint64, _u8p]
    lib.kh_ec_mul.argtypes = [_u8p, _u8p, _u8p]
    lib.kh_ec_mul.restype = ctypes.c_int
    lib.kh_ec_add.argtypes = [_u8p, _u8p, _u8p]
    lib.kh_ec_add.restype = ctypes.c_int
    lib.kh_ec_seed_lanes.argtypes = [_u8p, _u8p, _u8p, ctypes.c_uint64, _u8p, _u8p]
    lib.kh_ec_lift_x.argtypes = [_u8p, ctypes.c_int, _u8p]
    lib.kh_ec_lift_x.restype = ctypes.c_int
    lib.kh_radix_argsort_u64.argtypes = [_u64p, ctypes.c_uint64, _u32p]
    return lib


def ensure_built(quiet: bool = True) -> bool:
    """Build the library if missing (best-effort); returns availability."""
    if os.path.exists(_LIB_PATH):
        return _load() is not None
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       capture_output=quiet, check=True, timeout=300)
    except Exception:
        return False
    _load.cache_clear()
    return _load() is not None


def available() -> bool:
    return _load() is not None


def _buf(b: bytes):
    return ctypes.cast(ctypes.create_string_buffer(b, len(b)), _u8p)


def _np_u8p(a: np.ndarray):
    return a.ctypes.data_as(_u8p)


# -- hashes -------------------------------------------------------------------

def sha256(data: bytes) -> bytes:
    lib = _load()
    out = np.empty(32, np.uint8)
    lib.kh_sha256(_buf(data), len(data), _np_u8p(out))
    return out.tobytes()


def ripemd160(data: bytes) -> bytes:
    lib = _load()
    out = np.empty(20, np.uint8)
    lib.kh_ripemd160(_buf(data), len(data), _np_u8p(out))
    return out.tobytes()


def keccak256(data: bytes) -> bytes:
    lib = _load()
    out = np.empty(32, np.uint8)
    lib.kh_keccak256(_buf(data), len(data), _np_u8p(out))
    return out.tobytes()


def hash160(data: bytes) -> bytes:
    lib = _load()
    out = np.empty(20, np.uint8)
    mid = np.empty(32, np.uint8)
    lib.kh_sha256(_buf(data), len(data), _np_u8p(mid))
    lib.kh_ripemd160(_np_u8p(mid), 32, _np_u8p(out))
    return out.tobytes()


def hash160_batch(msgs: np.ndarray) -> np.ndarray:
    """(n, L) uint8 fixed-size messages -> (n, 20) uint8 hash160s."""
    lib = _load()
    msgs = np.ascontiguousarray(msgs, dtype=np.uint8)
    n, L = msgs.shape
    out = np.empty((n, 20), np.uint8)
    lib.kh_hash160_batch(_np_u8p(msgs), L, n, _np_u8p(out))
    return out


def sha256_batch(msgs: np.ndarray) -> np.ndarray:
    """(n, L) uint8 fixed-size messages -> (n, 32) uint8 digests."""
    lib = _load()
    msgs = np.ascontiguousarray(msgs, dtype=np.uint8)
    n, L = msgs.shape
    out = np.empty((n, 32), np.uint8)
    lib.kh_sha256_batch(_np_u8p(msgs), L, n, _np_u8p(out))
    return out


def xxh64(data: bytes, seed: int = 0) -> int:
    lib = _load()
    return int(lib.kh_xxh64(_buf(data), len(data), seed & 0xFFFFFFFFFFFFFFFF))


# -- EC -------------------------------------------------------------------

def _pt_to_be(pt) -> bytes:
    if pt is None:
        return b"\x00" * 64
    return pt[0].to_bytes(32, "big") + pt[1].to_bytes(32, "big")


def _pt_from_be(b: bytes):
    if not any(b):
        return None
    return (int.from_bytes(b[:32], "big"), int.from_bytes(b[32:64], "big"))


def pubkey_batch(keys: list[int]) -> list:
    """[k, ...] -> [(x, y) | None, ...] (None for k ≡ 0 mod n)."""
    lib = _load()
    n = len(keys)
    kin = np.frombuffer(b"".join((k % (1 << 256)).to_bytes(32, "big") for k in keys),
                        dtype=np.uint8).copy()
    out = np.empty(n * 64, np.uint8)
    lib.kh_ec_pubkey_batch(_np_u8p(kin), n, _np_u8p(out))
    raw = out.tobytes()
    return [_pt_from_be(raw[i * 64:(i + 1) * 64]) for i in range(n)]


def ec_mul(k: int, pt=None):
    lib = _load()
    if pt is None:
        return pubkey_batch([k])[0]
    out = np.empty(64, np.uint8)
    ok = lib.kh_ec_mul(_buf((k % (1 << 256)).to_bytes(32, "big")),
                       _buf(_pt_to_be(pt)), _np_u8p(out))
    return _pt_from_be(out.tobytes()) if ok else None


def ec_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    lib = _load()
    out = np.empty(64, np.uint8)
    ok = lib.kh_ec_add(_buf(_pt_to_be(a)), _buf(_pt_to_be(b)), _np_u8p(out))
    return _pt_from_be(out.tobytes()) if ok else None


def seed_lanes(q, c0: int, stride: int, lanes: int):
    """P[l] = Q - (c0 + l*stride)*G for l in range(lanes).

    Returns (xy, inf_mask): xy (lanes, 64) uint8 big-endian x||y rows and a
    (lanes,) uint8 mask marking lanes where Q == (c0 + l*stride)*G (the key
    is exactly c0 + l*stride).
    """
    lib = _load()
    out = np.empty((lanes, 64), np.uint8)
    mask = np.empty(lanes, np.uint8)
    lib.kh_ec_seed_lanes(_buf(_pt_to_be(q)),
                         _buf((c0 % (1 << 256)).to_bytes(32, "big")),
                         _buf((stride % (1 << 256)).to_bytes(32, "big")),
                         lanes, _np_u8p(out), _np_u8p(mask))
    return out, mask


def lift_x(x: int, odd: bool):
    lib = _load()
    out = np.empty(32, np.uint8)
    ok = lib.kh_ec_lift_x(_buf(x.to_bytes(32, "big")), int(odd), _np_u8p(out))
    if not ok:
        raise ValueError("x is not on the curve")
    return (x, int.from_bytes(out.tobytes(), "big"))


# -- sort -----------------------------------------------------------------

def radix_argsort_u64(keys: np.ndarray) -> np.ndarray:
    """Stable ascending argsort of a uint64 array (LSB radix, native)."""
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    perm = np.empty(keys.shape[0], np.uint32)
    lib.kh_radix_argsort_u64(keys.ctypes.data_as(_u64p), keys.shape[0],
                             perm.ctypes.data_as(_u32p))
    return perm
