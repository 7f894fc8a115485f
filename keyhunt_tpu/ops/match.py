"""Device-side membership probing against sorted target tables.

The reference's match layer is bloom filter -> sorted array binary search
(`bloom/bloom.cpp`, `searchbinary` `keyhunt.cpp:3065-3089`). On TPU the
equivalent hot-path primitive is a vectorized `searchsorted` over a sorted
uint32 key table resident in HBM, with a second-word confirm to push the
false-positive rate to ~2^-64. Exact (full-width) verification of the rare
survivors happens on host against a Python set — mirroring the reference's
recompute-verify step — so device false positives are harmless and device
false negatives are the only correctness risk (see `probe` docstring).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32


def build_table(pairs: list[tuple[int, int]]) -> tuple[np.ndarray, np.ndarray]:
    """Host: list of (w0, w1) uint32 pairs -> lexicographically sorted
    parallel arrays (t0, t1), padded to a power-of-two length with
    0xFFFFFFFF sentinels.

    Padding keeps probe-table SHAPES stable across target sets of similar
    size, so jitted search steps (which take the table as a runtime
    argument) are compiled once per size class, not once per target file.
    A sentinel can only "match" a query equal to 2^64-1 — rejected by the
    exact host verify like any other false positive.
    """
    n = max(len(pairs), 1)
    size = 1 << (n - 1).bit_length()
    t0 = np.full(size, 0xFFFFFFFF, np.uint32)
    t1 = np.full(size, 0xFFFFFFFF, np.uint32)
    if pairs:
        arr = np.array(sorted(pairs), dtype=np.uint64)
        t0[: len(pairs)] = arr[:, 0].astype(np.uint32)
        t1[: len(pairs)] = arr[:, 1].astype(np.uint32)
    return t0, t1


def probe(t0, t1, w0, w1):
    """Boolean hit mask: does (w0, w1) appear in the sorted (t0, t1) table?

    Binary search on the first word, then confirm (t0, t1) at idx..idx+2 —
    this covers up to three targets sharing the same first word. With more
    than three first-word duplicates a hit could be missed; target sets are
    uniformly-distributed hashes, so P(4+ collisions on 32 bits) is
    negligible for any loadable target count (< 2^-40 at 10M targets).
    """
    n = t0.shape[0]
    idx = jnp.searchsorted(t0, w0)
    hit = jnp.zeros(w0.shape, bool)
    for d in range(3):
        j = jnp.clip(idx + d, 0, n - 1)
        hit = hit | ((t0[j] == w0) & (t1[j] == w1))
    return hit


def probe_pos(t0, t1, w0, w1, depth: int = 4):
    """Like `probe`, but also returns the sorted-table POSITION of the
    first matching entry. Used by BSGS, where a fragment hit must map back
    to its baby index j (the reference's bsgs_xvalue {6-byte X, uint64
    index} pairs + bsgs_searchbinary, `keyhunt.cpp:132-135,4412-4546`).
    The position→j permutation stays in host RAM (hits are rare), so the
    device table is 8 bytes/entry instead of 12 — proportionally more
    baby steps per HBM byte.

    depth bounds first-word duplicate chains; at m = 2^24 entries the
    probability of a >4 chain is ~4% per table — callers building larger
    tables pass a bigger depth (cost: one gather+compare each).
    """
    n = t0.shape[0]
    idx = jnp.searchsorted(t0, w0)
    hit = jnp.zeros(w0.shape, bool)
    pos = jnp.zeros(w0.shape, U32)
    for d in range(depth):
        j = jnp.clip(idx + d, 0, n - 1)
        ok = (t0[j] == w0) & (t1[j] == w1)
        pos = jnp.where(ok & ~hit, j.astype(U32), pos)
        hit = hit | ok
    return hit, pos


# -- bucketed probe: direct-indexed fixed-size buckets --------------------
#
# The searchsorted binary search is a 26-iteration while loop of gathers;
# composed into larger jitted programs it costs ~150x its standalone time
# on the current XLA:TPU toolchain (measured r2). The bucket layout
# removes the loop entirely: entries are grouped by the top bits of their
# first word into fixed-size padded slabs, and a probe is ONE gather of
# each query's slab row + a vectorized compare — the TPU-native reading of
# the reference's 256-way byte-sharded blooms + 257-bucket table index
# (`keyhunt.cpp:1704-1718`, `build_bptable_cache` 186-244).

def build_buckets(t0, t1, perm, avg: int = 32):
    """Host: sorted fragment arrays -> direct-indexed bucket slabs.

    Returns (slab0, slab1, permpad, shift) where slab* have shape
    (nbuckets, maxlen) with 0xFFFFFFFF sentinel padding, bucket index =
    w0 >> shift, and permpad maps padded slots back to baby indices.
    maxlen is the ACTUAL largest bucket (no overflow possible)."""
    m = int(t0.shape[0])
    # nb >= 2 keeps shift <= 31 (a 32-bit shift on uint32 lanes is UB)
    nb = 1 << max((m // max(avg, 1)).bit_length() - 1, 1)
    shift = 32 - (nb.bit_length() - 1)
    b = (t0.astype(np.uint32) >> np.uint32(shift)).astype(np.int64)
    counts = np.bincount(b, minlength=nb)
    maxlen = max(int(counts.max()), 1)
    starts = np.zeros(nb, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    offsets = np.arange(m, dtype=np.int64) - np.repeat(starts, counts)
    slots = b * maxlen + offsets
    slab0 = np.full(nb * maxlen, 0xFFFFFFFF, np.uint32)
    slab1 = np.full(nb * maxlen, 0xFFFFFFFF, np.uint32)
    permpad = np.zeros(nb * maxlen, np.uint32)
    slab0[slots] = t0
    slab1[slots] = t1
    permpad[slots] = perm
    return (slab0.reshape(nb, maxlen), slab1.reshape(nb, maxlen),
            permpad, shift)


def probe_buckets(slab0, slab1, w0, w1, shift: int):
    """Device: (hit, pos) for each query — ONE row gather per slab + a
    vectorized compare over the bucket. pos indexes the PADDED slot space
    (bucket*maxlen + slot); callers map through the padded permutation.
    Exact (scans the whole bucket): no duplicate-chain depth limit."""
    maxlen = slab0.shape[1]
    bidx = jax.lax.shift_right_logical(w0, jnp.uint32(shift)).astype(jnp.int32)
    r0 = slab0[bidx]                               # (Bq, maxlen)
    r1 = slab1[bidx]
    eq = (r0 == w0[:, None]) & (r1 == w1[:, None])
    hit = eq.any(axis=1)
    slot = jnp.argmax(eq, axis=1).astype(U32)
    pos = bidx.astype(U32) * np.uint32(maxlen) + slot
    return hit, pos


# -- PACKED bucket slabs: 4 bytes per device slot -------------------------
#
# The two-word slabs store the full 64-bit fragment, but the bucket index
# already pins the top (32 - shift) bits of w0 — storing them again is
# pure HBM waste, and HBM bytes are the k-factor ceiling (SURVEY §5: the
# reference's whole RAM->speed trade, README.md:819-928). The packed
# layout keeps ONE uint32 per slot: the 32 fragment bits immediately
# BELOW the bucket bits,
#
#     residual = bits [64-bbits-32, 64-bbits) of (w0||w1)
#              = (w0 << bbits) | (w1 >> shift),     bbits = 32 - shift
#
# so a probe still matches bbits + 32 fragment bits (>= 54 at m = 2^30,
# avg = 256). False positives (~maxlen * 2^-32 per query, ~0.04 per
# 524288-query dispatch) cost one host verify each — the same rare-path
# economics as the reference's bloom cascade, at HALF the device bytes of
# the two-word slabs and ~40% of the reference's own ~9.6 B/entry
# (6-byte table entry + ~3.6 B/entry of blooms, keyhunt.cpp:132-135,
# 1687-1781). This is what lets one 16 GB chip hold m = 2^30..2^31.
#
# Padded slots keep the 0xFFFFFFFF sentinel; a real entry whose residual
# happens to equal the sentinel still matches correctly (the sentinel only
# ever CAUSES false positives, never false negatives).
#
# Position decode moves fully host-side: pos = bucket*maxlen + slot, and
# since entries are bucket-contiguous in the sorted order, the sorted
# index is starts[bucket] + slot — no padded permutation array at all
# (VERDICT r3 next-steps #1).

def pack_residual(w0, w1, shift: int):
    """The stored/compared uint32 residual of a 64-bit fragment (w0, w1)
    under bucket shift `shift`. Works on numpy and jnp operands."""
    bbits = 32 - shift
    if isinstance(w0, np.ndarray):
        return ((w0 << np.uint32(bbits)) | (w1 >> np.uint32(shift))) \
            .astype(np.uint32)
    return (jax.lax.shift_left(w0, jnp.uint32(bbits))
            | jax.lax.shift_right_logical(w1, jnp.uint32(shift)))


def build_buckets_packed(t0, t1, avg: int = 256):
    """Host: lexicographically sorted fragment arrays -> packed slabs.

    Returns (slab, starts, shift): slab (nbuckets, maxlen) uint32
    residuals with sentinel padding; starts (nbuckets+1,) int64 prefix
    offsets into the SORTED order (bucket b's entries are the sorted
    indices [starts[b], starts[b+1])), used by the host to map a padded
    hit position back to its baby index."""
    m = int(t0.shape[0])
    nb = 1 << max((m // max(avg, 1)).bit_length() - 1, 1)
    shift = 32 - (nb.bit_length() - 1)
    t0 = np.asarray(t0)
    t1 = np.asarray(t1)
    b = (t0 >> np.uint32(shift)).astype(np.int64)
    counts = np.bincount(b, minlength=nb)
    maxlen = max(int(counts.max()), 1)
    starts = np.zeros(nb + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    offsets = np.arange(m, dtype=np.int64) - starts[b]
    slab = np.full(nb * maxlen, 0xFFFFFFFF, np.uint32)
    slab[b * maxlen + offsets] = pack_residual(t0, t1, shift)
    return slab.reshape(nb, maxlen), starts, shift


def probe_buckets_packed(slab, w0, w1, shift: int):
    """Device: (hit, pos) against a packed slab — one row gather + a
    vectorized residual compare. pos = bucket*maxlen + slot (the padded
    slot space; map through starts on host)."""
    maxlen = slab.shape[1]
    bidx = jax.lax.shift_right_logical(w0, jnp.uint32(shift)).astype(jnp.int32)
    res = pack_residual(w0, w1, shift)
    row = slab[bidx]                               # (Bq, maxlen)
    eq = row == res[:, None]
    hit = eq.any(axis=1)
    slot = jnp.argmax(eq, axis=1).astype(U32)
    pos = bidx.astype(U32) * np.uint32(maxlen) + slot
    return hit, pos


def probe_buckets_packed_flat(slab_flat, maxlen: int, w0, w1, shift: int):
    """Packed probe against a FLAT (nb*maxlen,) slab. The device-built
    table (search.dtable) keeps its slabs 1-D: XLA's 2-D scatter lowering
    inserts a full flattening reshape of the operand — a relayout that
    costs a slab-sized HLO temp (6 GiB at m=2^30, OOM on a 16 GB chip) —
    while 1-D scatters update in place. The row read here is a windowed
    `lax.gather` (contiguous maxlen-slices), the moral equivalent of the
    2-D row gather."""
    bidx = jax.lax.shift_right_logical(w0, jnp.uint32(shift)).astype(jnp.int32)
    res = pack_residual(w0, w1, shift)
    starts = (bidx * np.int32(maxlen))[:, None]            # (Bq, 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    row = jax.lax.gather(slab_flat, starts, dn,
                         slice_sizes=(maxlen,),
                         mode=jax.lax.GatherScatterMode.CLIP)
    eq = row == res[:, None]
    hit = eq.any(axis=1)
    slot = jnp.argmax(eq, axis=1).astype(U32)
    pos = bidx.astype(U32) * np.uint32(maxlen) + slot
    return hit, pos


def probe_buckets_packed_ranged(slab, w0, w1, shift: int, base):
    """Packed probe against a PARTITION: slab holds global bucket rows
    [base, base + per); base is a TRACED int32 scalar (one compile per
    sweep). Off-partition queries miss; pos is GLOBAL."""
    per, maxlen = slab.shape
    gb = jax.lax.shift_right_logical(w0, jnp.uint32(shift)).astype(jnp.int32)
    res = pack_residual(w0, w1, shift)
    lb = gb - base
    mine = (lb >= 0) & (lb < per)
    row = slab[jnp.clip(lb, 0, per - 1)]           # (Bq, maxlen)
    eq = (row == res[:, None]) & mine[:, None]
    hit = eq.any(axis=1)
    slot = jnp.argmax(eq, axis=1).astype(U32)
    pos = gb.astype(U32) * np.uint32(maxlen) + slot
    return hit, pos


def probe_buckets_ranged(slab0, slab1, w0, w1, shift: int, base):
    """Like `probe_buckets`, but against a PARTITION of the global bucket
    space: slab* hold rows for global buckets [base, base + per) only.
    `base` is a TRACED int32 scalar, so one compile serves every partition
    of a sweep (the over-HBM regime: a table bigger than device memory is
    split into bucket-contiguous partitions and the giant walk sweeps the
    range once per resident partition — the TPU reading of the reference's
    mmap'd chunked blooms, `bloom/bloom.cpp:491-765`,
    `keyhunt.cpp:1844-1956`). Off-partition queries simply miss. pos is the
    GLOBAL padded slot (gb*maxlen + slot) — same space as probe_buckets
    over the full slabs."""
    per, maxlen = slab0.shape
    gb = jax.lax.shift_right_logical(w0, jnp.uint32(shift)).astype(jnp.int32)
    lb = gb - base
    mine = (lb >= 0) & (lb < per)
    lclip = jnp.clip(lb, 0, per - 1)
    r0 = slab0[lclip]                              # (Bq, maxlen)
    r1 = slab1[lclip]
    eq = (r0 == w0[:, None]) & (r1 == w1[:, None]) & mine[:, None]
    hit = eq.any(axis=1)
    slot = jnp.argmax(eq, axis=1).astype(U32)
    pos = gb.astype(U32) * np.uint32(maxlen) + slot
    return hit, pos


def topk_indices(mask_flat, k: int):
    """Compress a boolean hit mask to at most k flat indices (-1 padded).
    The rare-hit path: k bounds hits *per step*, host re-scans if saturated.

    `lax.top_k` over the full candidate space costs milliseconds on TPU
    (it sorts); a search step's mask is all-false except when a key is
    actually found, so the extraction is gated behind a `lax.cond` on the
    (cheap) hit count — the hot loop pays one reduction, the sort runs
    only on the handful of steps that ever contain a hit."""
    count = mask_flat.sum(dtype=jnp.int32)

    def extract(m):
        vals, idxs = jax.lax.top_k(m.astype(jnp.int32), k)
        return jnp.where(vals > 0, idxs, -1)

    idxs = jax.lax.cond(count > 0, extract,
                        lambda m: jnp.full((k,), -1, jnp.int32), mask_flat)
    return idxs, count


def topk_with_payload(mask, payload, k: int):
    """(lanes, payload[lanes], count) for up to k set positions of `mask`,
    -1/0 padded — same `lax.cond` gating as `topk_indices` (the sort +
    gather run only on steps that actually contain a hit)."""
    count = mask.sum(dtype=jnp.int32)
    n = mask.shape[0]

    def extract(args):
        m, p = args
        vals, idx = jax.lax.top_k(m.astype(jnp.int32), k)
        lanes = jnp.where(vals > 0, idx, -1)
        sel = jnp.where(vals > 0, p[jnp.clip(idx, 0, n - 1)], 0)
        return lanes, sel

    lanes, sel = jax.lax.cond(
        count > 0, extract,
        lambda args: (jnp.full((k,), -1, jnp.int32),
                      jnp.zeros((k,), payload.dtype)),
        (mask, payload))
    return lanes, sel, count
