"""Pallas TPU kernel for the fused hash160 pipeline (sha256 -> ripemd160).

Why a kernel: the jnp hash160 expands to ~1.5k elementwise uint32 ops
(64 sha rounds + 48 schedule words + 2x80 ripemd rounds) whose
intermediates XLA materialises in HBM at walker batch sizes — measured
~20 ms per 2^18-lane hash160 pair on a v5e, i.e. the walker step is
hash-bound, not EC-bound. Fusing the whole pipeline into one VMEM-resident
kernel moves 32 bytes in + 40 bytes out per element instead of kilobytes.

The round logic is shared with the XLA path: `ops.sha256._compress` /
`ops.ripemd160.ripemd160_32` are pure jnp on values, so the kernel body
calls them directly on VMEM blocks (batch = (rows, 128) tiles).

Reference equivalents: the 4-way SSE `sha256sse_1B` + `ripemd160sse_32`
pair glued by `Secp256K1::GetHash160_fromX` (`SECP256K1.cpp:1207-1250`,
`hash/sha256_sse.cpp`, `hash/ripemd160_sse.cpp`) — here the 4 SSE lanes
become the whole device batch and the glue becomes VMEM residency.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sha256 import sha256_compressed, sha256_uncompressed
from .ripemd160 import ripemd160_32

U32 = jnp.uint32

#: batch elements per grid block. Live state during a sha round is ~26
#: (rows, 128) u32 arrays; at 8192 elements that is ~0.85 MB — comfortably
#: inside VMEM with the in/out blocks.
TILE = 8192


def _h160_both_kernel(x_ref, h02_ref, h03_ref):
    x = x_ref[:]                                   # (8, rows, 128)
    batch = x.shape[1:]
    for pref, out_ref in ((0x02, h02_ref), (0x03, h03_ref)):
        prefix = jnp.full(batch, pref, U32)
        out_ref[:] = ripemd160_32(sha256_compressed(prefix, x))


def _h160_uncompressed_kernel(x_ref, y_ref, h_ref):
    h_ref[:] = ripemd160_32(sha256_uncompressed(x_ref[:], y_ref[:]))


def _in_spec(rows):
    return pl.BlockSpec((8, rows, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _out_spec(rows):
    return pl.BlockSpec((5, rows, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _h160_both_call(total: int, tile: int, interpret: bool):
    rows = tile // 128
    return pl.pallas_call(
        _h160_both_kernel,
        out_shape=(jax.ShapeDtypeStruct((5, total // 128, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((5, total // 128, 128), jnp.uint32)),
        grid=(total // tile,),
        in_specs=[_in_spec(rows)],
        out_specs=(_out_spec(rows), _out_spec(rows)),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _h160_uncompressed_call(total: int, tile: int, interpret: bool):
    rows = tile // 128
    return pl.pallas_call(
        _h160_uncompressed_kernel,
        out_shape=jax.ShapeDtypeStruct((5, total // 128, 128), jnp.uint32),
        grid=(total // tile,),
        in_specs=[_in_spec(rows), _in_spec(rows)],
        out_specs=_out_spec(rows),
        interpret=interpret,
    )


def supported(shape) -> bool:
    """Kernel path supported for this (8, *batch) operand shape?

    The real constraint is lane alignment: the batch must flatten to a
    multiple of 128 (the VPU lane width) — `_pick_tile` then always finds
    a tile that divides it, so any such batch is grid-coverable with no
    tail block."""
    total = 1
    for d in shape[1:]:
        total *= d
    return total >= 128 and total % 128 == 0


def _pick_tile(total: int, tile: int | None) -> int:
    """Largest tile <= TILE that is a multiple of 128 AND divides `total`
    (grid blocks must cover the batch exactly — a partial tail block would
    silently never be written)."""
    if total % 128 != 0 or total < 128:
        raise ValueError(f"pallas hash160 needs a 128-multiple batch, got {total}")
    if tile is not None:
        if total % tile != 0 or tile % 128 != 0:
            raise ValueError(f"tile {tile} must divide total {total} and be a "
                             f"multiple of 128")
        return tile
    rows = total // 128
    d = min(rows, TILE // 128)
    while rows % d:
        d -= 1
    return d * 128


def _flatten3(a):
    return a.reshape(a.shape[0], -1, 128)


def hash160_both(x_norm, tile: int | None = None, interpret: bool = False):
    """(h02, h03) hash160 under both compressed prefixes — fused kernel.
    x_norm: (8, *batch) canonical X limbs; returns two (5, *batch) LE-word
    hashes (same contract as ops.hash160.hash160_both_prefixes)."""
    shape = x_norm.shape
    total = int(np.prod(shape[1:]))
    tile = _pick_tile(total, tile)
    h02, h03 = _h160_both_call(total, tile, interpret)(_flatten3(x_norm))
    out_shape = (5,) + shape[1:]
    return h02.reshape(out_shape), h03.reshape(out_shape)


def hash160_uncompressed(x_norm, y_norm, tile: int | None = None,
                         interpret: bool = False):
    """hash160 of the 65-byte uncompressed pubkey — fused kernel."""
    shape = x_norm.shape
    total = int(np.prod(shape[1:]))
    tile = _pick_tile(total, tile)
    h = _h160_uncompressed_call(total, tile, interpret)(
        _flatten3(x_norm), _flatten3(y_norm))
    return h.reshape((5,) + shape[1:])
