"""Target-file loading for every search mode.

Mirrors the reference loaders `readFileAddress` / `...Eth` / `...XPoint` /
`readFileVanity` (`keyhunt.cpp:7033-7455`): one target per line; addresses
are base58, rmd160/eth/xpoint targets are hex; inline comments after
whitespace are ignored (the fixture files carry puzzle annotations).

A `TargetSet` keeps (a) the exact host-side set of target bytes for final
verification and (b) sorted (w0, w1) uint32 device probe tables
(`ops.match`).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

import numpy as np

from . import base58
from ..ref import ecc


@dataclass
class TargetSet:
    mode: str                       # 'hash160' | 'xpoint' | 'eth'
    exact: set                      # bytes20 (hash160/eth) or int X (xpoint)
    t0: np.ndarray = dfield(repr=False, default=None)
    t1: np.ndarray = dfield(repr=False, default=None)
    # xpoint extras: original pubkey points when parseable (for BSGS etc.)
    points: list = dfield(default_factory=list)

    @property
    def count(self) -> int:
        return len(self.exact)


def _strip(line: str) -> str:
    line = line.strip()
    for sep in (" ", "\t", "#"):
        if sep in line:
            line = line.split(sep, 1)[0].strip()
    return line


def _build(pairs, mode, exact, points=None) -> TargetSet:
    from ..ops import match
    t0, t1 = match.build_table(pairs)
    return TargetSet(mode=mode, exact=exact, t0=t0, t1=t1, points=points or [])


def load_hash160_file(path: str, is_address: bool) -> TargetSet:
    """Address (base58) or raw rmd160-hex targets -> hash160 TargetSet."""
    exact, pairs = set(), []
    with open(path) as fh:
        for line in fh:
            tok = _strip(line)
            if not tok:
                continue
            h = base58.address_to_hash160(tok) if is_address else bytes.fromhex(tok)
            if len(h) != 20:
                raise ValueError(f"bad hash160 target: {tok}")
            exact.add(h)
            pairs.append(_h160_words(h))
    return _build(pairs, "hash160", exact)


def load_eth_file(path: str) -> TargetSet:
    exact, pairs = set(), []
    with open(path) as fh:
        for line in fh:
            tok = _strip(line)
            if not tok:
                continue
            if tok.lower().startswith("0x"):
                tok = tok[2:]
            h = bytes.fromhex(tok)
            if len(h) != 20:
                raise ValueError(f"bad eth target: {tok}")
            exact.add(h)
            pairs.append(_h160_words(h))
    return _build(pairs, "eth", exact)


def load_xpoint_file(path: str) -> TargetSet:
    """X-coordinate targets: compressed/uncompressed pubkey hex or raw
    64-char X hex (reference: readFileXPoint, keyhunt.cpp:7392-7455)."""
    exact, pairs, points = set(), [], []
    with open(path) as fh:
        for line in fh:
            tok = _strip(line)
            if not tok:
                continue
            if len(tok) == 64:
                x = int(tok, 16)
                points.append(None)
            else:
                pt = ecc.parse_pubkey_hex(tok)
                x = pt[0]
                points.append(pt)
            exact.add(x)
            pairs.append(_x_words(x))
    return _build(pairs, "xpoint", exact, points)


def load_pubkeys_file(path: str) -> list:
    """Full public keys (BSGS input; keyhunt.cpp:1367-1449)."""
    pts = []
    with open(path) as fh:
        for line in fh:
            tok = _strip(line)
            if not tok:
                continue
            pts.append(ecc.parse_pubkey_hex(tok))
    return pts


def _h160_words(h: bytes) -> tuple[int, int]:
    """First 8 bytes of a 20-byte hash as the 2 LE probe words (matches the
    ripemd160_32 / eth_address_words device output convention)."""
    return (int.from_bytes(h[0:4], "little"), int.from_bytes(h[4:8], "little"))


def _x_words(x: int) -> tuple[int, int]:
    """Top 64 bits of an X coordinate as probe words (device compares the
    normalized limb 7 then limb 6)."""
    return ((x >> 224) & 0xFFFFFFFF, (x >> 192) & 0xFFFFFFFF)
