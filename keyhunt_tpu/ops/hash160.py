"""EC -> hash pipelines: the device analogs of Secp256K1::GetHash160 /
GetHash160_fromX (`SECP256K1.cpp:1045-1250`) and
generate_binaddress_eth (`keyhunt.cpp`).

All functions take limb-major (8, *batch) X/Y field elements (already
normalized — callers run `field.norm` first) and return hash words shaped
(5, *batch) (hash160, little-endian words) or (8, *batch) (keccak digest).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sha256 import sha256_compressed, sha256_uncompressed
from .ripemd160 import ripemd160_32
from .keccak import keccak256_pubkey64

U32 = jnp.uint32

#: backend routing, mirroring ops.field: "auto" sends lane-aligned batches
#: through the fused Pallas kernel on accelerator backends (ops.pallas_hash
#: keeps the whole sha256->ripemd160 pipeline VMEM-resident — measured ~20 ms
#: per 2^18-lane pair as jnp/HBM vs ~1 ms fused), everything else through
#: the jnp expansion. "jnp"/"pallas" force a path (tests, benchmarks).
_IMPL = "auto"


def set_impl(name: str) -> None:
    global _IMPL
    assert name in ("auto", "jnp", "pallas")
    _IMPL = name


def _use_pallas(shape) -> bool:
    if _IMPL == "jnp":
        return False
    from . import pallas_hash
    if not pallas_hash.supported(shape):
        return False
    if _IMPL == "pallas":
        return True
    return jax.default_backend() != "cpu"


def hash160_from_x(x_norm, parity) -> jnp.ndarray:
    """hash160 of the compressed pubkey (0x02|parity || X_be).

    `parity` is a (*batch,) uint32 of 0/1 — the Y-parity bit. The two-prefix
    search trick (check 0x02 AND 0x03 for every X, covering keys k and n-k
    without computing Y — `SECP256K1.cpp:1207-1250`) is expressed by calling
    this twice with parity 0 and 1.
    """
    prefix = np.uint32(0x02) + parity
    return ripemd160_32(sha256_compressed(prefix, x_norm))


def _both_jnp(x_norm):
    batch = x_norm.shape[1:]
    zero = jnp.zeros(batch, U32)
    one = jnp.ones(batch, U32)
    return hash160_from_x(x_norm, zero), hash160_from_x(x_norm, one)


def hash160_both_prefixes(x_norm):
    """(h02, h03): hash160 under both compressed prefixes, sharing nothing
    but the message build — two hashes per point, 2 keys-per-point counting
    (`keyhunt.cpp:2883-2891`).

    Routed like `field.mul`: `platform_dependent` lowers to the fused
    Pallas kernel on accelerators and the jnp expansion on CPU devices, so
    a CPU-mesh shard_map inside a TPU-default process still lowers."""
    if _use_pallas(x_norm.shape):
        from . import pallas_hash
        return jax.lax.platform_dependent(
            x_norm, cpu=_both_jnp, default=pallas_hash.hash160_both)
    return _both_jnp(x_norm)


def _uncompressed_jnp(x_norm, y_norm):
    return ripemd160_32(sha256_uncompressed(x_norm, y_norm))


def hash160_uncompressed(x_norm, y_norm) -> jnp.ndarray:
    """hash160 of the 65-byte uncompressed pubkey (04 || X || Y)."""
    if _use_pallas(x_norm.shape):
        from . import pallas_hash
        return jax.lax.platform_dependent(
            x_norm, y_norm, cpu=_uncompressed_jnp,
            default=pallas_hash.hash160_uncompressed)
    return _uncompressed_jnp(x_norm, y_norm)


def eth_address_words(x_norm, y_norm) -> jnp.ndarray:
    """(5, *batch) LE words of the 20-byte ETH address
    (keccak256(X||Y)[12:32])."""
    digest = keccak256_pubkey64(x_norm, y_norm)
    return digest[3:8]
