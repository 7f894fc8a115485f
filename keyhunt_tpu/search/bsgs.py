"""Baby-Step Giant-Step search — the flagship mode.

Reference architecture (`keyhunt.cpp` §3.2 of SURVEY.md): baby table of
j*G X-fragments for j=1..m (3-level bloom cascade + sorted 6-byte table),
then giant strides of 2m keys whose points are probed against the table;
each giant point covers 2m keys because X(jG) = X(-jG).

TPU redesign:
- baby table: built on-device by the batched walker geometry, stored as
  (w0, w1) = top-64-bit X fragments lexicographically sorted with an index
  permutation. The probe is a vectorized searchsorted in HBM — the bloom
  cascade's job (cheap membership) is done by the 64-bit exact fragment
  check, false positives ~2^-40 per giant batch, so the cascade's 2nd/3rd
  levels collapse into the host verify.
- giant walk: every target gets a block of lanes in ONE device batch; all
  lanes advance by -(B*2m)*G per step with a single batched inversion
  (T targets x B lanes x S steps per dispatch). keys/s = lanes x steps x 2m.
- degenerate lanes (giant point == ±advance point, or the target key
  landing exactly on a stride center) are detected branch-free and
  resolved analytically on host (see `_decode_flags`).

Effective-keys accounting matches the reference: each probed giant point
counts 2m keys (`keyhunt.cpp:2871-2874`).
"""

from __future__ import annotations

import functools
import os
import hashlib
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import u256, field, curve, match
from ..ref import ecc
from ..io.results import ResultSink
from ..stats import SpeedMeter, si

U32 = jnp.uint32

#: degenerate-lane report slots per step (lanes whose point x-equals the
#: advance point — each IS a solved key, resolved analytically on host)
DEGEN_SLOTS = 4


# ---------------------------------------------------------------------------
# Baby-step table
# ---------------------------------------------------------------------------

@dataclass
class BabyTable:
    m: int
    t0: np.ndarray      # sorted fragment word 0 (X limb 7)
    t1: np.ndarray      # fragment word 1 (X limb 6), lexicographic under t0
    perm: np.ndarray    # original j-1 (uint32) for each sorted slot
    depth: int = 4
    srcdir: str | None = None   # .d directory this table was loaded from
    verify: bool = True         # honor -6 for derived sidecar files too

    def buckets(self, avg: int | None = None):
        """Direct-indexed bucket slabs (ops.match.build_buckets), built
        lazily from the canonical sorted arrays and cached: (slab0, slab1,
        permpad, shift). The device probe gathers one slab row per query —
        no binary-search loop (see match.build_buckets for why).

        avg picks the memory/gather trade: maxlen ~ avg + sqrt(2*avg*ln nb)
        (Poisson tail), so padding overhead shrinks as avg grows while the
        per-query gather row grows linearly. Measured at m=2^28 on the
        chip: avg=256 beats avg=32 on BOTH axes (16.9 vs 14.6 M pts/s,
        2.6 vs 4.0 GiB slabs) — HBM bytes ARE the k-factor ceiling
        (SURVEY §5), so big tables take 256; small tables keep 32 (tiny
        rows, compile reuse across the test fleet)."""
        if avg is None:
            avg = 32 if self.m <= (1 << 24) else 256
        cached = getattr(self, "_buckets", None)
        if cached is None:
            cached = match.build_buckets(np.asarray(self.t0),
                                         np.asarray(self.t1),
                                         np.asarray(self.perm), avg=avg)
            self._buckets = cached
        return cached

    def device_buckets(self):
        """(slab0_dev, slab1_dev, permpad, shift) with the slabs RESIDENT
        on the device, cached on the table. Engines sharing one BabyTable
        (the daemon: one resident table, many queries) must not re-upload
        multi-GB slabs per request — the first query pays the host bucket
        build + upload, later ones reuse both."""
        cached = getattr(self, "_dev_buckets", None)
        if cached is None:
            slab0, slab1, permpad, shift = self.buckets()
            cached = (jnp.asarray(slab0), jnp.asarray(slab1), permpad, shift)
            self._dev_buckets = cached
        return cached

    # -- packed layout: 4 B/slot (the r4 density redesign) ----------------

    def default_avg(self) -> int:
        """Bucket mean for the packed slabs. Bigger avg = less Poisson-tail
        padding but a longer per-query gather row; measured on the chip at
        m=2^28, avg=256 beat avg=32 on BOTH speed and bytes. r5 stage
        breakdown (tools/bench_walkparts.py at m=2^31): the probe's row
        gather is ~76% of the dispatch and scales with maxlen, while the
        128-lane alignment equalizes the pad factor — avg=256 (384-wide
        rows) halves the probe reads of avg=512 (768-wide) at the SAME
        12 GiB slab, so 256 is right at every large m."""
        if self.m <= (1 << 24):
            return 32
        return 256

    def packed(self, avg: int | None = None):
        """(slab, starts, shift) packed bucket slabs (4 bytes per device
        slot — ops.match.build_buckets_packed). Built lazily and cached;
        tables loaded from a .d directory also cache the built slabs ON
        DISK (packed<avg>.{slab,starts}.npy + json with sha256), so a
        daemon/CLI restart skips the multi-GB host rebuild."""
        if avg is None:
            avg = self.default_avg()
        cached = getattr(self, "_packed", None)
        if cached is not None and cached[0] == avg:
            return cached[1]
        trip = self._load_packed_sidecar(avg)
        if trip is None:
            trip = match.build_buckets_packed(np.asarray(self.t0),
                                              np.asarray(self.t1), avg=avg)
            self._save_packed_sidecar(avg, trip)
        slab, starts, shift = trip
        if slab.shape[1] % 128 and slab.size * 4 >= (1 << 30):
            # lane-align maxlen for multi-GiB slabs: a non-128-multiple
            # minor dim makes XLA relayout the resident slab into a
            # padded HLO temp AS BIG AS THE SLAB (measured: the m=2^31
            # maxlen=643 slab compiled a 12.0 GiB copy and OOM'd the
            # chip); padding on host makes the upload layout-exact.
            # Sentinel pad slots only ever CAUSE false positives, and
            # pos decode uses the padded maxlen everywhere.
            pad = 128 - slab.shape[1] % 128
            slab = np.pad(np.asarray(slab), ((0, 0), (0, pad)),
                          constant_values=0xFFFFFFFF)
            trip = (slab, starts, shift)
        self._packed = (avg, trip)
        return trip

    def device_packed(self, avg: int | None = None):
        """(slab_dev, starts, shift) with the slab device-resident, cached
        (same daemon economics as device_buckets). Multi-GB slabs ride the
        chunked, checksum-verified transfer (runtime.fast_put — ~30-45
        MB/s real on the tunneled dev runtime; see its docstring)."""
        cached = getattr(self, "_dev_packed", None)
        if cached is None:
            from ..runtime import fast_put
            slab, starts, shift = self.packed(avg)
            cached = (fast_put(np.asarray(slab)), starts, shift)
            self._dev_packed = cached
        return cached

    def pos_to_j(self, pos: int) -> int | None:
        """Padded slab position (bucket*maxlen + slot) -> baby index j
        (1-based), or None for a padded-sentinel false positive."""
        slab, starts, _ = self.packed()
        return decode_packed_pos(pos, starts, slab.shape[1], self.perm)

    def _sidecar_paths(self, avg: int):
        if not self.srcdir or not os.path.isdir(self.srcdir):
            return None
        stem = os.path.join(self.srcdir, f"packed{avg}")
        return (stem + ".slab.npy", stem + ".starts.npy", stem + ".json")

    def _load_packed_sidecar(self, avg: int):
        import json
        paths = self._sidecar_paths(avg)
        if paths is None or not all(os.path.exists(p) for p in paths):
            return None
        slab_p, starts_p, meta_p = paths
        with open(meta_p) as fh:
            meta = json.load(fh)
        if self.verify:
            for p, key in ((slab_p, "slab"), (starts_p, "starts")):
                if _file_sha256(p) != meta["sha256"][key]:
                    raise ValueError(f"checksum mismatch in {p}")
        return (np.load(slab_p, mmap_mode="r"), np.load(starts_p),
                int(meta["shift"]))

    def _save_packed_sidecar(self, avg: int, trip):
        import json
        paths = self._sidecar_paths(avg)
        if paths is None:
            return
        slab_p, starts_p, meta_p = paths
        slab, starts, shift = trip
        np.save(slab_p, slab)
        np.save(starts_p, starts)
        meta = {"shift": shift, "avg": avg,
                "sha256": {"slab": _file_sha256(slab_p),
                           "starts": _file_sha256(starts_p)}}
        with open(meta_p, "w") as fh:
            json.dump(meta, fh)


def decode_packed_pos(pos: int, starts, maxlen: int, perm) -> int | None:
    """Padded packed-slab position -> baby index j (1-based): entries are
    bucket-contiguous in sorted order, so sorted index = starts[bucket] +
    slot; None for padded-sentinel false positives (slot past the bucket's
    real count) — the 4 B/slot layout's whole position story."""
    bucket, slot = divmod(int(pos), maxlen)
    if bucket + 1 >= len(starts):
        return None
    sidx = int(starts[bucket]) + slot
    if sidx >= int(starts[bucket + 1]):
        return None
    return int(perm[sidx]) + 1


def default_depth(m: int) -> int:
    """Duplicate-chain scan depth for the 64-bit fragment probe. A true
    hit is missed only if ≥depth OTHER entries share its first 32-bit
    word; first words are ~Poisson(m/2^32), so depth 4/6/8 keeps the miss
    probability < 1e-9 per hit up to m = 2^31."""
    if m <= 1 << 26:
        return 4
    if m <= 1 << 29:
        return 6
    return 8


def _builder_step(A: int, W: int, S: int):
    """Device fn emitting X fragments of keys [k0+1 .. k0+A*W*S]; same
    pivot/offset geometry as the search walker (walker.py), X-only."""
    gtx, gty = map(jnp.asarray, curve.offset_table(W))
    spx, spy = map(jnp.asarray, curve.point_const(A * W))

    def one(carry, _):
        px, py = carry
        dx_main = field.sub(gtx[:, None, :], px[:, :, None])
        dx_step = field.sub(spx, px)
        alldx = jnp.concatenate([dx_main.reshape(8, A * W), dx_step], axis=1)
        inv = field.batch_inv(alldx)
        inv_main = inv[:, : A * W].reshape(8, A, W)
        inv_step = inv[:, A * W:]
        pxb, pyb = px[:, :, None], py[:, :, None]
        x3 = curve.add_with_inv(pxb, pyb, gtx[:, None, :], gty[:, None, :],
                                inv_main, want_y=False)
        xn = field.norm(x3)
        frag = jnp.stack([xn[7].reshape(-1), xn[6].reshape(-1)])   # (2, A*W)
        px2, py2 = curve.add_with_inv(px, py, spx, spy, inv_step)
        return (field.norm(px2), field.norm(py2)), frag

    def run(px, py):
        (px2, py2), frags = jax.lax.scan(one, (px, py), None, length=S)
        return px2, py2, frags          # frags: (S, 2, A*W)

    return jax.jit(run)


def build_baby_table(m: int, pivots: int = 16, width: int = 512,
                     steps: int = 4, depth: int | None = None,
                     progress: bool = False) -> BabyTable:
    """Build the j*G fragment table for j = 1..m.

    Keys 1..W+1 come straight from the host offset table (their points are
    the walker's own constants); the rest are generated on-device in
    batches (the TPU analog of `thread_bPload`, keyhunt.cpp:5284-5472).
    """
    A, W, S = pivots, width, steps
    frags0 = np.zeros((2, m), dtype=np.uint32)
    # host part: j = 1..min(W+1, m)
    host_n = min(W + 1, m)
    hx, _ = curve.offset_table(max(host_n, 2))
    frags0[0, :host_n] = hx[7, :host_n]
    frags0[1, :host_n] = hx[6, :host_n]
    if m > host_n:
        run = _builder_step(A, W, S)
        k0 = host_n                      # device covers [k0+1, ...]
        keys = [k0 + a * W for a in range(A)]
        x, y = curve.points_for_keys(keys)
        px, py = jnp.asarray(x), jnp.asarray(y)
        pos = host_n
        span = A * W * S
        while pos < m:
            px, py, frags = run(px, py)
            chunk = np.asarray(frags).transpose(1, 0, 2).reshape(2, span)
            take = min(span, m - pos)
            frags0[:, pos:pos + take] = chunk[:, :take]
            pos += take
            if progress:
                print(f"\r[+] baby table {pos}/{m}", end="", flush=True)
        if progress:
            print(flush=True)
    packed = (frags0[0].astype(np.uint64) << 32) | frags0[1].astype(np.uint64)
    from .. import native
    if native.available():
        perm = native.radix_argsort_u64(packed)
    else:
        perm = np.argsort(packed, kind="stable").astype(np.uint32)
    spacked = packed[perm]
    return BabyTable(m=m,
                     t0=(spacked >> 32).astype(np.uint32),
                     t1=(spacked & 0xFFFFFFFF).astype(np.uint32),
                     perm=perm,
                     depth=depth if depth is not None else default_depth(m))


# -- persistence (the -S semantics; reference keyhunt_bsgs_* files with
#    embedded sha256 checksums, keyhunt.cpp:2504-2652) ----------------------
#
# Two formats:
# - .npz single file (small m): everything loaded to RAM.
# - .d directory (large m — the reference's mmap/--ptable scale regime,
#   keyhunt.cpp:1844-1956, bloom.cpp:491-765): t0/t1/perm as raw .npy
#   files, loaded with np.load(mmap_mode='r') so host RSS stays bounded;
#   the device upload streams from the mapping and the position→j perm is
#   consulted through the mapping only on rare hits.

#: tables at or above this m default to the directory/memmap format
DIR_FORMAT_MIN_M = 1 << 26


def table_path(m: int, directory: str = ".") -> str:
    ext = "d" if m >= DIR_FORMAT_MIN_M else "npz"
    return os.path.join(directory, f"keyhunt_tpu_bsgs_{m:x}.{ext}")


def _is_dir_format(path: str) -> bool:
    return path.endswith(".d") or path.endswith("/") or os.path.isdir(path)


def _norm_table_path(path: str) -> str:
    if _is_dir_format(path):
        return path
    # np.savez appends ".npz" to bare names; keep save/load agreeing.
    return path if path.endswith(".npz") else path + ".npz"


def _file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 24), b""):
            h.update(chunk)
    return h.hexdigest()


def save_table(tbl: BabyTable, directory: str = ".", path: str | None = None) -> str:
    path = _norm_table_path(path or table_path(tbl.m, directory))
    if _is_dir_format(path):
        return _save_table_dir(tbl, path)
    blob = tbl.t0.tobytes() + tbl.t1.tobytes() + tbl.perm.tobytes()
    checksum = hashlib.sha256(blob).hexdigest()
    np.savez(path, m=tbl.m, t0=tbl.t0, t1=tbl.t1, perm=tbl.perm,
             sha256=np.frombuffer(bytes.fromhex(checksum), dtype=np.uint8))
    return path


def _save_table_dir(tbl: BabyTable, dirpath: str) -> str:
    import json
    os.makedirs(dirpath, exist_ok=True)
    sums = {}
    for name in ("t0", "t1", "perm"):
        fp = os.path.join(dirpath, name + ".npy")
        np.save(fp, getattr(tbl, name))
        sums[name] = _file_sha256(fp)
    meta = {"m": tbl.m, "depth": tbl.depth, "sha256": sums}
    with open(os.path.join(dirpath, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    tbl.srcdir = dirpath        # future packed() builds cache on disk here
    return dirpath


def load_table(m: int, directory: str = ".", verify: bool = True,
               path: str | None = None, mmap: bool = True) -> BabyTable | None:
    path = _norm_table_path(path or table_path(m, directory))
    if _is_dir_format(path):
        return _load_table_dir(m, path, verify=verify, mmap=mmap)
    if not os.path.exists(path):
        return None
    data = np.load(path)
    if int(data["m"]) != m:
        raise ValueError(f"{path} holds a table for m={int(data['m']):#x}, "
                         f"wanted m={m:#x}")
    tbl = BabyTable(m=m, t0=data["t0"], t1=data["t1"], perm=data["perm"],
                    depth=default_depth(m))
    if verify:
        blob = tbl.t0.tobytes() + tbl.t1.tobytes() + tbl.perm.tobytes()
        want = bytes(data["sha256"].tobytes())
        if hashlib.sha256(blob).digest() != want:
            raise ValueError(f"checksum mismatch in {path}")
    return tbl


def _load_table_dir(m: int, dirpath: str, verify: bool = True,
                    mmap: bool = True) -> BabyTable | None:
    import json
    meta_path = os.path.join(dirpath, "meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as fh:
        meta = json.load(fh)
    if int(meta["m"]) != m:
        raise ValueError(f"{dirpath} holds a table for m={int(meta['m']):#x}, "
                         f"wanted m={m:#x}")
    arrs = {}
    for name in ("t0", "t1", "perm"):
        fp = os.path.join(dirpath, name + ".npy")
        if verify and _file_sha256(fp) != meta["sha256"][name]:
            raise ValueError(f"checksum mismatch in {fp}")
        arrs[name] = np.load(fp, mmap_mode="r" if mmap else None)
    return BabyTable(m=m, t0=arrs["t0"], t1=arrs["t1"], perm=arrs["perm"],
                     depth=int(meta.get("depth", default_depth(m))),
                     srcdir=dirpath, verify=verify)


# ---------------------------------------------------------------------------
# Giant-step walk
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BsgsConfig:
    m: int                      # baby table size
    lanes: int = 1024           # giant lanes per target (B)
    steps: int = 8              # probes per lane per dispatch (S)
    max_hits: int = 4
    # sequential|backward|both|random|dance|ggsb|angrygiant
    # (keyhunt -B, keyhunt.cpp:4592-6305). angrygiant's bucket-by-first-byte
    # probe ordering (keyhunt.cpp:4718-4817) is a CPU-cache strategy with no
    # TPU analog — the device probe is fully parallel — so it schedules like
    # sequential. ggsb splits the baby table into blocks searched in passes
    # (BsgsGgsbConfig, keyhunt.cpp:478-485,1477-1499).
    scheduler: str = "sequential"
    block_count: int = 0        # ggsb: number of baby-table blocks
    block_size: int = 0         # ggsb: babies per block
    # over-HBM regime: split the bucket slabs into P value-contiguous
    # partitions; only one partition is device-resident at a time and the
    # giant walk sweeps the range once per partition (full coverage after
    # P sweeps). The TPU reading of the reference's mmap'd chunked blooms
    # + bP files (bloom.cpp:491-765, keyhunt.cpp:1844-1956): capacity
    # beyond device memory, paid for in sweep count. 0/1 = whole table
    # resident (normal regime).
    table_partitions: int = 0

    @property
    def stride(self) -> int:    # keys covered per giant point
        return 2 * self.m

    def keys_per_call(self, n_targets: int) -> int:
        return n_targets * self.lanes * self.steps * self.stride

    def ggsb_blocks(self) -> tuple[int, int]:
        """Resolved (block_count, block_size) — the reference's derivation
        (keyhunt.cpp:1477-1499): either knob implies the other."""
        count, size = self.block_count, self.block_size
        if count == 0 and size == 0:
            count = 1
        if count > 0 and size == 0:
            size = (self.m + count - 1) // count
        elif size > 0 and count == 0:
            count = (self.m + size - 1) // size
        return max(count, 1), max(size, 1)


def bucket_partitions(tbl: BabyTable, parts: int):
    """Split the PACKED bucket slab into `parts` value-contiguous
    partitions: partition p holds global bucket rows [p*per, (p+1)*per).
    Returns ([(slab_p, base_row)], starts, shift) — starts is the GLOBAL
    bucket prefix shared by all partitions (the ranged probe reports
    global padded positions; tbl.pos_to_j maps them to baby indices)."""
    slab, starts, shift = tbl.packed()
    nb, maxlen = slab.shape
    if nb % parts:
        pad = parts - nb % parts
        fill = np.full((pad, maxlen), 0xFFFFFFFF, np.uint32)
        slab = np.concatenate([np.asarray(slab), fill])
        starts = np.concatenate(
            [starts, np.full(pad, starts[-1], starts.dtype)])
        nb += pad
    per = nb // parts
    out = [(slab[p * per:(p + 1) * per], p * per) for p in range(parts)]
    return out, starts, shift


def probe_chunks_for(queries: int, maxlen: int,
                     budget_bytes: int = 3 << 29) -> int:
    """Sequential probe chunks so the row-gather temp (queries x maxlen
    x 4 B — XLA materializes it) stays under ~1.5 GiB: at m=2^31 the
    full 2^21 x 768 gather is 6 GiB and OOMs next to the 12 GiB slab.
    Power of two (queries are), 1 = unchunked."""
    rows_bytes = queries * maxlen * 4
    chunks = 1
    while rows_bytes // chunks > budget_bytes and chunks < queries:
        chunks *= 2
    return chunks


@functools.lru_cache(maxsize=None)
def make_giant_step_fn(cfg: BsgsConfig, n_targets: int, shift: int = 4,
                       ranged: bool = False, flat_maxlen: int | None = None,
                       probe_chunks: int = 1):
    """Jitted giant walk: state (X, Y, Z) of T*B JACOBIAN lanes; the fused
    scan kernel (ops.jacwalk) advances every lane by -(B*2m)*G per inner
    step WITHOUT any inversion, stacking each step's (X, Z); ONE deferred
    batched inversion converts all S*L emissions to affine fragments, and
    ONE batched bucket probe covers all queries.

    Launch economics (the r3 redesign): the r2 affine walk paid a batched
    inversion (2 kernel launches) plus ~a dozen fusions PER STEP — 19 M
    giant points/s measured, launch-bound. The Jacobian walk is one
    kernel per CALL plus one shared inversion, so per-call cost is nearly
    independent of S. The probe runs against the PACKED slab (4 B/slot,
    ops.match.build_buckets_packed — bucket-implied prefix bits are not
    stored, which is what fits m = 2^30+ in one chip's HBM); the slab
    rides as a runtime arg, `shift` keys the compile cache.

    Outputs: top-K flat hit indices into the (S, L) query space + their
    padded slab positions + count (1,), and per step up to DEGEN_SLOTS
    degenerate-lane indices (lanes whose point x-equals the advance point
    — each IS a solved key, resolved analytically by the host, -1 pad)."""
    from ..ops import jacwalk
    B, S, K = cfg.lanes, cfg.steps, cfg.max_hits
    L = n_targets * B
    adv = ecc.ec_mul(B * cfg.stride)
    negadv = ecc.ec_neg(adv)

    def walk(X, Y, Z):
        Xo, Yo, Zo, xs, zs, dg = jacwalk.giant_scan(
            X, Y, Z, negadv[0], negadv[1], S)
        xa = jacwalk.to_affine_x(xs, zs)     # (8, S*L) canonical
        w0 = xa[7]                           # step-major
        w1 = xa[6]
        # degenerate flags: gated top-k per step (hits are ~never)
        def extract(m):
            vals, idx = jax.lax.top_k(m.astype(jnp.int32), DEGEN_SLOTS)
            return jnp.where(vals > 0, idx, -1)
        flags = jax.lax.cond(
            dg.sum() > 0, extract,
            lambda m: jnp.full((S, DEGEN_SLOTS), -1, jnp.int32), dg)
        return Xo, Yo, Zo, w0, w1, flags

    # ALL host-bound outputs pack into ONE uint32 vector: each separate
    # fetch costs a ~14 ms tunnel round trip regardless of size, and a
    # RANK-0 fetch costs seconds (both measured) — layout
    # [lanes(K) | jsel(K) | count(1) | flags(S*DEGEN_SLOTS)], int32
    # values bit-reinterpreted (see BsgsEngine._drain).
    def _pack(lanes, jsel, count, flags):
        return jnp.concatenate([
            lanes.astype(jnp.uint32).reshape(-1),
            jsel.astype(jnp.uint32).reshape(-1),
            count.astype(jnp.uint32).reshape(1),
            flags.astype(jnp.uint32).reshape(-1)])

    def _chunked(probe, w0, w1):
        """Probe in `probe_chunks` sequential slices (lax.map) so the
        row-gather temp is bounded (probe_chunks_for)."""
        if probe_chunks <= 1:
            return probe(w0, w1)
        Q = w0.shape[0]
        c = probe_chunks
        h, p = jax.lax.map(lambda ab: probe(ab[0], ab[1]),
                           (w0.reshape(c, Q // c), w1.reshape(c, Q // c)))
        return h.reshape(Q), p.reshape(Q)

    def run(X, Y, Z, slab):
        Xo, Yo, Zo, w0, w1, flags = walk(X, Y, Z)
        if isinstance(slab, tuple):
            # split slab (two bucket-contiguous pieces — device tables
            # past the int32 flat-scatter ceiling, search.dtable): two
            # ranged probes OR-combined; pos is global in both
            lo, hi = slab

            def probe2(a, b):
                h0, p0 = match.probe_buckets_packed_ranged(
                    lo, a, b, shift, jnp.int32(0))
                h1, p1 = match.probe_buckets_packed_ranged(
                    hi, a, b, shift, jnp.int32(lo.shape[0]))
                return h0 | h1, jnp.where(h1, p1, p0)

            hit, pos = _chunked(probe2, w0, w1)
        elif flat_maxlen is not None:    # device-built flat slab (dtable)
            hit, pos = _chunked(
                lambda a, b: match.probe_buckets_packed_flat(
                    slab, flat_maxlen, a, b, shift), w0, w1)
        else:
            hit, pos = _chunked(
                lambda a, b: match.probe_buckets_packed(slab, a, b, shift),
                w0, w1)
        lanes, jsel, count = match.topk_with_payload(hit, pos, K)
        return Xo, Yo, Zo, _pack(lanes, jsel, count, flags)

    def run_ranged(X, Y, Z, slab, base):
        # partition probe: slab holds global bucket rows [base, base+per)
        Xo, Yo, Zo, w0, w1, flags = walk(X, Y, Z)
        hit, pos = _chunked(
            lambda a, b: match.probe_buckets_packed_ranged(
                slab, a, b, shift, base), w0, w1)
        lanes, jsel, count = match.topk_with_payload(hit, pos, K)
        return Xo, Yo, Zo, _pack(lanes, jsel, count, flags)

    return jax.jit(run_ranged if ranged else run)


def seed_lanes(cfg: BsgsConfig, targets: list, c0: int, on_exact=None,
               lane_offsets=None):
    """Host: lane points P[t, l] = Q_t - (c0 + l*stride)*G as (8, T*B)
    device arrays.

    Native fast path (keyhunt_native.cpp `kh_ec_seed_lanes`): one scalar
    mult + a Jacobian chain + ONE batched inversion per target — the host
    analog of the reference's per-thread `point_aux` setup
    (keyhunt.cpp:4635-4642). Python fallback for builds without the .so.

    A lane that lands exactly on Q (point at infinity) IS the private key
    c0 + l*stride: `on_exact(t, key)` is invoked and the lane replaced by
    a dummy to keep shapes static.
    """
    from .. import native
    B = cfg.lanes
    if on_exact is None:
        on_exact = lambda t, key: None        # noqa: E731
    if native.available():
        xc = np.empty((8, len(targets) * B), np.uint32)
        yc = np.empty((8, len(targets) * B), np.uint32)
        for t, q in enumerate(targets):
            xy, infm = native.seed_lanes(q, c0, cfg.stride, B)
            for l in np.nonzero(infm)[0]:
                on_exact(t, c0 + int(l) * cfg.stride)
                xy[l, :32] = np.frombuffer(ecc.G[0].to_bytes(32, "big"), np.uint8)
                xy[l, 32:] = np.frombuffer(ecc.G[1].to_bytes(32, "big"), np.uint8)
            # (B, 64) big-endian x||y rows -> (8, B) LE uint32 limb cols
            words = xy.reshape(B, 16, 4)[..., ::-1].copy().view(np.uint32)
            words = words.reshape(B, 16)             # BE word order
            xc[:, t * B:(t + 1) * B] = words[:, 7::-1].T
            yc[:, t * B:(t + 1) * B] = words[:, 15:7:-1].T
        return jnp.asarray(xc), jnp.asarray(yc)
    if lane_offsets is None:
        step = ecc.ec_mul(cfg.stride)
        offs, acc = [None], None
        for _ in range(B - 1):
            acc = ecc.ec_add(acc, step)
            offs.append(acc)
        lane_offsets = lambda: offs               # noqa: E731
    offs = lane_offsets()
    xs, ys = [], []
    for t, q in enumerate(targets):
        sbase = ecc.ec_sub(q, ecc.ec_mul(c0))   # Q - c0*G
        for l in range(B):
            pt = ecc.ec_sub(sbase, offs[l]) if offs[l] is not None else sbase
            if pt is None:
                on_exact(t, c0 + l * cfg.stride)
                pt = ecc.G
            xs.append(pt[0])
            ys.append(pt[1])
    return (jnp.asarray(u256.from_ints(xs)), jnp.asarray(u256.from_ints(ys)))


class BsgsEngine:
    """Host orchestration: seeds lanes, dispatches giant batches, verifies
    candidates exactly, reconstructs keys (c ± j), reports.

    All T unfound targets share one device batch (T*B lanes)."""

    def __init__(self, cfg: BsgsConfig, tbl: BabyTable, targets: list,
                 start: int, end: int, sink: ResultSink | None = None,
                 quiet: bool = False, rng_seed: int | None = None,
                 stats_every: float = 5.0, matrix: bool = False,
                 devices: int | None = None):
        assert end > start >= 1
        self.cfg = cfg
        self.tbl = tbl
        self.targets = list(targets)          # [(x, y) points]
        self.start, self.end = start, end
        self.sink = sink or ResultSink(quiet=quiet)
        self.quiet = quiet
        self.stats_every = stats_every
        self.matrix = matrix          # -M: scrolling lines (keyhunt.cpp:965)
        self.meter = SpeedMeter()
        self.found: dict[int, int] = {}   # ORIGINAL target index -> key
        # target dropout (the reference's giant loop only walks UNFOUND
        # targets, keyhunt.cpp:4642): when enough targets are found, the
        # engine rebuilds with the unfound ones and wider lanes, so the
        # freed device batch re-covers live targets instead of walking
        # dead ones. _tmap maps current lane-target index -> original.
        self._n_all = len(self.targets)
        self._tmap = list(range(self._n_all))
        self._resume_c0: int | None = None
        # device parallelism: D > 1 shards the baby table across the mesh's
        # aggregate HBM (value-range shards) and gives every device its own
        # stripe of giant lanes — SURVEY.md §5's "k-factor becomes aggregate
        # HBM across the slice" story.
        self.n_devices = int(devices) if devices else 1
        if self.n_devices > 1:
            from ..parallel.mesh import make_mesh
            self.mesh = make_mesh(self.n_devices)
        else:
            self.mesh = None
        self._passes = self._build_passes()   # tagged pass descriptors
        self._set_pass(self._passes[0])
        self._offsets_cache: list | None = None
        import random as _r
        self.rng = _r.Random(rng_seed)

    def _build_passes(self):
        """Probe tables per search pass, tagged ("tbl", t0, t1, perm) or
        ("part", slab, base, starts, shift).

        One pass (the whole sorted table) for every scheduler except:
        - ggsb, which splits the BABY INDICES into blocks: pass b probes
          only j in (b*bs, (b+1)*bs] (the TPU reading of the reference's
          GGSB block search, keyhunt.cpp:1477-1499);
        - table_partitions P > 1 (over-HBM regime), which splits the
          BUCKET SLABS into P value-contiguous partitions: each pass
          sweeps the range against one device-resident partition (see
          BsgsConfig.table_partitions)."""
        tbl = self.tbl
        if self.cfg.table_partitions > 1:
            if self.cfg.scheduler == "ggsb":
                raise ValueError("table_partitions and the ggsb scheduler "
                                 "are both pass machineries; pick one")
            if self.n_devices > 1:
                # composed regime: partition each device's bucket shard —
                # aggregate HBM (mesh) x sweep count (partitions), so a
                # pod can hold tables beyond its aggregate HBM (the
                # reference analog: chunked mmap blooms beyond RAM,
                # bloom.cpp:491-765). Pass p keeps piece p of EVERY
                # device resident (parallel.bsgs_sharded).
                return [("spart", p, self.cfg.table_partitions)
                        for p in range(self.cfg.table_partitions)]
            parts, starts, shift = bucket_partitions(
                tbl, self.cfg.table_partitions)
            return [("part", slab, base, starts, shift)
                    for slab, base in parts]
        if self.cfg.scheduler != "ggsb":
            return [("tbl", tbl.t0, tbl.t1, tbl.perm)]
        if tbl.perm is None:
            raise ValueError("ggsb needs the host baby table "
                             "(--dtable has no host index)")
        count, size = self.cfg.ggsb_blocks()
        if count <= 1:
            return [("tbl", tbl.t0, tbl.t1, tbl.perm)]
        pad_n = 1 << (max(size, 1) - 1).bit_length()
        passes = []
        for b in range(count):
            lo, hi = b * size, min((b + 1) * size, tbl.m)
            sel = (tbl.perm >= lo) & (tbl.perm < hi)      # sorted order kept
            t0, t1, perm = tbl.t0[sel], tbl.t1[sel], tbl.perm[sel]
            n = t0.shape[0]
            if n < pad_n:   # sentinel-pad to one shared shape (one compile)
                fill = pad_n - n
                t0 = np.concatenate([t0, np.full(fill, 0xFFFFFFFF, np.uint32)])
                t1 = np.concatenate([t1, np.full(fill, 0xFFFFFFFF, np.uint32)])
                perm = np.concatenate([perm, np.zeros(fill, np.uint32)])
            passes.append(("tbl", t0, t1, perm))
        return passes

    def _set_pass(self, entry):
        """Activate one pass. "tbl" passes convert the sorted arrays to the
        packed direct-indexed bucket layout; "part" passes bind one
        resident packed partition + its base row (base is a runtime
        argument, so all partitions share ONE compile). Single-device: the
        slab rides as a runtime jit argument. Multi-device: rebuild the
        sharded stepper (cached by slab geometry, parallel.bsgs_sharded).
        Each pass installs `self._pos_to_j`, the host decode from padded
        slab positions to baby indices (None = sentinel false positive)."""
        if entry[0] == "spart":
            from ..parallel.bsgs_sharded import make_sharded_giant_step
            _, p, nparts = entry
            self._base = None
            self._slab = None
            self.step_fn = make_sharded_giant_step(
                self.cfg, self.tbl, self.mesh, len(self.targets),
                part=p, parts=nparts)
            self._pos_to_j = self.step_fn.pos_to_j
            return
        if entry[0] == "part":
            from ..runtime import fast_put
            _, slab, base, starts, shift = entry
            self._slab = fast_put(np.asarray(slab))
            self._base = jnp.int32(base)
            maxlen = slab.shape[1]
            perm = self.tbl.perm
            self._pos_to_j = lambda pos: decode_packed_pos(
                pos, starts, maxlen, perm)
            self.step_fn = make_giant_step_fn(
                self.cfg, len(self.targets), shift, ranged=True,
                probe_chunks=self._probe_chunks(maxlen))
            return
        _, t0, t1, perm = entry
        self._base = None
        sub = self.tbl if t0 is self.tbl.t0 else \
            BabyTable(m=self.tbl.m, t0=t0, t1=t1, perm=perm,
                      depth=self.tbl.depth)
        if self.n_devices > 1:
            from ..parallel.bsgs_sharded import make_sharded_giant_step
            self.step_fn = make_sharded_giant_step(
                self.cfg, sub, self.mesh, len(self.targets))
            self._pos_to_j = self.step_fn.pos_to_j
            self._slab = None
        else:
            # whole-table pass: the device-resident slab cache lives on
            # the (possibly shared) BabyTable, so daemon queries reuse
            # one upload; ggsb sub-tables build their own slabs. Device-
            # built tables (dtable) carry a FLAT slab + maxlen.
            self._slab, starts, shift = sub.device_packed()
            self._pos_to_j = sub.pos_to_j
            s0 = self._slab[0] if isinstance(self._slab, tuple) \
                else self._slab
            maxlen = getattr(sub, "flat_maxlen", None) or \
                (getattr(sub, "maxlen", None) or s0.shape[-1])
            self.step_fn = make_giant_step_fn(
                self.cfg, len(self.targets), shift,
                flat_maxlen=getattr(sub, "flat_maxlen", None),
                probe_chunks=self._probe_chunks(maxlen))

    def _probe_chunks(self, maxlen: int) -> int:
        q = self.cfg.steps * len(self.targets) * self.cfg.lanes
        return probe_chunks_for(q, int(maxlen))

    def _dispatch(self, state):
        """One device call. Returns (new_state, payload): payload is the
        packed uint32 vector on the single-device path (see
        make_giant_step_fn._pack) or the (lanes, jsel, counts, flags)
        tuple on the sharded path. Both paths walk Jacobian (X, Y, Z)
        state through the fused jacwalk kernel (the sharded port landed
        in r4, parallel/bsgs_sharded.py)."""
        if self._base is not None:
            out = self.step_fn(*state, self._slab, self._base)
            return out[:3], out[3]
        if self.n_devices > 1:
            out = self.step_fn(*state)
            return out[:3], out[3:]
        out = self.step_fn(*state, self._slab)
        return out[:3], out[3]

    def _drain(self, c0, payload):
        cfg = self.cfg
        if isinstance(payload, tuple):        # sharded path
            lanes, jsel, counts, flags = (np.asarray(a) for a in payload)
        else:                                 # packed single-device vector
            arr = np.asarray(payload)
            K, S = cfg.max_hits, cfg.steps
            lanes = arr[:K].view(np.int32)
            jsel = arr[K:2 * K]
            counts = arr[2 * K:2 * K + 1].view(np.int32)
            flags = arr[2 * K + 1:].view(np.int32).reshape(S, DEGEN_SLOTS)
        self._decode(c0, lanes, jsel, counts, flags)

    # lane-offset table: l * (2m) * G for l = 0..lanes_total-1, built once

    def _lane_offsets(self):
        want = self.n_devices * self.cfg.lanes
        if self._offsets_cache is None or len(self._offsets_cache) != want:
            step = ecc.ec_mul(self.cfg.stride)
            pts, acc = [None], None
            for _ in range(want - 1):
                acc = ecc.ec_add(acc, step)
                pts.append(acc)
            self._offsets_cache = pts          # pts[l] = l*stride*G (None=inf)
        return self._offsets_cache

    def _seed(self, c0: int):
        """Host: P[t, l] = Q_t - (c0 + l*stride)*G for every target/lane,
        as Jacobian state (X, Y, Z=1) — both paths walk the fused
        Jacobian kernel. Exact-landing lanes (Q on a stride center) are
        recorded as found. Multi-device: global lanes l = d*B + b,
        columns reordered device-major so P(None, AXIS) hands device d
        its (T, B) block."""
        import dataclasses
        D = self.n_devices
        wide = dataclasses.replace(self.cfg, lanes=D * self.cfg.lanes) \
            if D > 1 else self.cfg
        px, py = seed_lanes(wide, self.targets, c0, on_exact=self._record,
                            lane_offsets=self._lane_offsets)
        if D > 1:
            T, B = len(self.targets), self.cfg.lanes
            px = np.asarray(px).reshape(8, T, D, B) \
                .transpose(0, 2, 1, 3).reshape(8, -1)
            py = np.asarray(py).reshape(8, T, D, B) \
                .transpose(0, 2, 1, 3).reshape(8, -1)
        else:
            px, py = np.asarray(px), np.asarray(py)
        z = np.zeros((8, px.shape[1]), np.uint32)
        z[0] = 1
        if D > 1:
            return px, py, z    # numpy: jit in_shardings place on the mesh
        return jnp.asarray(px), jnp.asarray(py), jnp.asarray(z)

    def _record(self, t: int, key: int):
        key %= ecc.N
        orig = self._tmap[t]
        if orig in self.found:
            return
        if ecc.pubkey(key)[0] != self.targets[t][0]:
            return
        # fix the sign: X matches both key and N-key
        if ecc.pubkey(key) != self.targets[t]:
            key = ecc.N - key
        self.found[orig] = key
        self.sink.record(key, "btc", compressed=True)

    # scheduler: yields c0 for successive dispatch blocks ------------------

    def _blocks(self, start_c0: int | None = None):
        cfg = self.cfg
        span = self.span                    # keys per dispatch per target
        c_lo = self.start + self.cfg.m                # first stride center
        if start_c0 is not None:            # dropout-resize resume point
            c_lo = start_c0
        nblocks = max((self.end + self.cfg.m - c_lo + span - 1) // span, 1)
        mode = cfg.scheduler
        if mode == "random":
            while True:
                yield c_lo + self.rng.randrange(nblocks) * span, 1
        elif mode == "dance":
            # the reference's dance walker picks TOP / BOTTOM / RANDOM per
            # claimed chunk (thread_process_bsgs_dance, keyhunt.cpp:5709-57):
            # bottom advances a cursor, top shrinks the end, random probes
            # the unswept middle without moving either.
            lo_i, hi_i = 0, nblocks
            while lo_i < hi_i:
                r = self.rng.randrange(3)
                if r == 0:                              # TOP
                    hi_i -= 1
                    yield c_lo + hi_i * span, 1
                elif r == 1:                            # BOTTOM
                    yield c_lo + lo_i * span, 1
                    lo_i += 1
                else:                                   # RANDOM middle
                    yield c_lo + self.rng.randrange(lo_i, hi_i) * span, 1
        elif mode == "backward":
            for b in range(nblocks - 1, -1, -1):
                yield c_lo + b * span, 1
        elif mode == "both":
            lo_i, hi_i = 0, nblocks - 1
            while lo_i <= hi_i:
                yield c_lo + lo_i * span, 1
                lo_i += 1
                if lo_i > hi_i:
                    break
                yield c_lo + hi_i * span, 1
                hi_i -= 1
        else:                          # sequential (also ggsb, angrygiant)
            for b in range(nblocks):
                yield c_lo + b * span, 1

    # global keys covered per dispatch per target (all devices)
    @property
    def span(self) -> int:
        return self.n_devices * self.cfg.lanes * self.cfg.steps \
            * self.cfg.stride

    def _resize_lanes(self) -> int | None:
        """Lanes per target after dropping found targets, or None when a
        resize would not widen the batch. Pow2, bounded by the 2^21
        probe-queries/call toolchain ceiling (auto_lanes)."""
        unfound = self._n_all - len(self.found)
        if unfound < 1 or unfound >= len(self.targets):
            return None
        cap = (1 << 21) // max(self.cfg.steps * unfound, 1)
        new_b = 1 << max(cap.bit_length() - 1, 0)
        # don't build lanes a small remaining range can never use
        want = max((self.end - self.start)
                   // (2 * self.cfg.m * max(self.cfg.steps, 1)) + 1, 1)
        new_b = min(new_b, max(1 << (want - 1).bit_length(), 256))
        return new_b if new_b > self.cfg.lanes else None

    def _drop_found_targets(self):
        """Rebuild the engine around the UNFOUND targets with wider lanes
        (the reference walks only unfound targets, keyhunt.cpp:4642; on
        TPU the batch shape is static, so dropout is a re-jit to a
        smaller target class — a handful of extra compiles per run,
        amortized by the persistent cache)."""
        import dataclasses
        new_b = self._resize_lanes()
        keep = [i for i, orig in enumerate(self._tmap)
                if orig not in self.found]
        self.targets = [self.targets[i] for i in keep]
        self._tmap = [self._tmap[i] for i in keep]
        self.cfg = dataclasses.replace(self.cfg, lanes=new_b)
        self._offsets_cache = None
        if not self.quiet:
            print(f"\n[+] dropout: {len(self.targets)} targets left, "
                  f"lanes -> {new_b}", flush=True)

    def run(self, max_seconds: float | None = None, max_keys: int | None = None):
        for tables in self._passes:
            self._set_pass(tables)
            start_c0 = None
            while True:
                self._resume_c0 = None
                self._run_pass(max_seconds=max_seconds, max_keys=max_keys,
                               start_c0=start_c0)
                if self._resume_c0 is None:
                    break
                start_c0 = self._resume_c0
                self._drop_found_targets()
                self._set_pass(tables)
            if len(self.found) >= self._n_all:
                break
            if max_seconds is not None and self.meter.elapsed > max_seconds:
                break
            if max_keys is not None and self.meter.total_keys >= max_keys:
                break
        if not self.quiet:
            print("\n" + self.meter.line(), flush=True)
        return self.found

    #: in-flight device dispatches (see Engine.PIPELINE — same economics)
    PIPELINE = 3

    def _warm_sync(self, state):
        """Multi-process only: AOT-compile, then barrier — the first
        collective must not race cold-cache compile skew into Gloo's
        ~30 s bring-up timeout (see Engine._warm_sync / runtime.sync)."""
        import jax
        if jax.process_count() == 1 or not hasattr(self.step_fn, "warmup"):
            return
        from ..runtime import sync
        self.step_fn.warmup(*state)
        sync("bsgs-warm")

    def _run_pass(self, max_seconds=None, max_keys=None, start_c0=None):
        cfg = self.cfg
        span = self.span
        import time as _t
        last_stats = _t.time()
        contiguous = cfg.scheduler in ("sequential", "ggsb", "angrygiant")
        # dropout only where "resume from here" is well-defined (a
        # contiguous sweep); random/dance cover the range statelessly
        can_resize = contiguous and self.n_devices == 1
        state = None
        state_c0 = None
        warmed = False
        inflight = []        # [(c0, lanes, jsel, counts, flags)] futures
        for c0, _ in self._blocks(start_c0):
            if len(self.found) >= self._n_all:
                break
            if can_resize and self._resize_lanes() is not None:
                # enough targets found: hand back to run() to rebuild
                # with the unfound set and wider lanes from state_c0 on
                self._resume_c0 = state_c0 if state_c0 is not None else c0
                break
            if state is None or not contiguous or state_c0 != c0:
                state = self._seed(c0)
                if len(self.found) >= self._n_all:
                    break
            if not warmed:
                self._warm_sync(state)
                warmed = True
            state, payload = self._dispatch(state)
            state_c0 = c0 + span
            # async device->host copies at enqueue time (see Engine.run)
            for a in (payload if isinstance(payload, tuple) else (payload,)):
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
            inflight.append((c0, payload))
            if len(inflight) > self.PIPELINE:
                self._drain(*inflight.pop(0))
            # a partition pass covers only m/P babies per giant point:
            # count effective keys honestly (full rate shows after P sweeps)
            parts = max(self.cfg.table_partitions, 1)
            self.meter.add(self.n_devices
                           * cfg.keys_per_call(len(self.targets)) // parts)
            now = _t.time()
            if not self.quiet and now - last_stats >= self.stats_every:
                if self.matrix:
                    print(f"[+] BSGS {si(self.meter.rate)}  c0 {c0:#x}", flush=True)
                else:
                    print(f"\r[+] BSGS {si(self.meter.rate)}  c0 {c0:#x}",
                          end="", flush=True)
                last_stats = now
            if max_seconds is not None and self.meter.elapsed > max_seconds:
                break
            if max_keys is not None and self.meter.total_keys >= max_keys:
                break
        for e in inflight:
            self._drain(*e)

    def _global_lane(self, g: int) -> tuple[int, int]:
        """Flat probe/flag index -> (target, key-lane). Multi-device flat
        layout is device-major (d, t, b); the key lane (the center index in
        c0 + lane*stride) is l = d*B + b."""
        B, D = self.cfg.lanes, self.n_devices
        if D == 1:
            return divmod(g, B)
        d, r = divmod(g, len(self.targets) * B)
        t, b = divmod(r, B)
        return t, d * B + b

    def _decode(self, c0: int, lanes, jsel, counts, flags):
        cfg = self.cfg
        DB = self.n_devices * cfg.lanes       # global lanes per target
        Lg = len(self.targets) * DB           # query-space width per step
        # probe hits: top-K flat indices into the (S, Lg) query space
        nhits = int(np.asarray(counts).reshape(-1)[0])
        if nhits > 0:
            if nhits >= cfg.max_hits:
                print(f"[W] BSGS hit buffer saturated at c0={c0:#x}; "
                      f"increase max_hits", flush=True)
            for k in range(cfg.max_hits):
                g = int(lanes[k])
                if g < 0:
                    continue
                s, r = divmod(g, Lg)
                t, lane = self._global_lane(r)
                c = c0 + (lane + s * DB) * cfg.stride
                # jsel is the padded slab position; the active pass's
                # host decode maps it to a baby index (None = padded-slot
                # sentinel false positive, nothing to check).
                j = self._pos_to_j(int(jsel[k]))
                if j is None:
                    continue
                self._record(t, c - j)
                self._record(t, c + j)
        # degenerate-lane flags: rows are (device-major ×) steps
        for row in range(flags.shape[0]):
            s = row % cfg.steps
            for g in flags[row]:
                g = int(g)
                if g < 0:
                    continue
                t, lane = self._global_lane(g)
                c = c0 + (lane + s * DB) * cfg.stride
                # P == ±advance point: Q = (c ± DB*stride)*G
                self._record(t, c + DB * cfg.stride)
                self._record(t, c - DB * cfg.stride)


# ---------------------------------------------------------------------------
# CLI entry (keyhunt -m bsgs surface)
# ---------------------------------------------------------------------------

def auto_lanes(m: int, steps: int, start: int, end: int,
               cap: int = 131072, n_targets: int = 1) -> int:
    """Range-based giant-lane sizing: cover [start, end] in one dispatch
    when the range allows, capped at the tuned chip geometry. Results are
    powers of two in [256, cap], so at most ~10 distinct compiles exist
    per (m, steps) — the daemon auto-sizes per query and still reuses the
    jit cache (VERDICT r3 weak #6).

    The cap applies to the TOTAL device batch (T targets x B lanes share
    one dispatch). 131072 lanes x 16 steps is the r4 measured optimum at
    m=2^30 (30.0 M giant points/s vs 16.7 M at 32768 lanes: per-call cost
    has an ~18 ms fixed floor on this runtime, so bigger dispatches win
    almost linearly until the ~26 ns/point marginal cost takes over). The
    second bound caps TOTAL PROBE QUERIES (steps*lanes) at 2^21 — the
    2.1 M-query probe compiles and runs; 4.2 M-query geometries fail in
    the TPU compile helper (measured r4, tools/bench_jacgeo.py)."""
    cap = min(cap, max((1 << 21) // max(steps, 1), 256))
    cap = max(cap // max(n_targets, 1), 256)
    # keep the cap a power of two: non-pow2 steps or target counts leave a
    # non-pow2 quotient, and a non-pow2 lane total trips giant_scan's L%128
    cap = 1 << (cap.bit_length() - 1)
    want = max((end - start) // (2 * m * max(steps, 1)) + 1, 1)
    lanes = max(256, min(cap, 1 << (want - 1).bit_length()))
    # the 256-lane floor can push the TOTAL query count back over the
    # 2^21/call toolchain ceiling (many targets and/or huge steps):
    # dispatching that geometry fails in the TPU compile helper, so fail
    # loudly here — run_bsgs_cli lowers `steps` and retries.
    if steps * n_targets * lanes > (1 << 21):
        raise ValueError(
            f"probe-query count {steps * n_targets * lanes} exceeds the "
            f"2^21/call ceiling ({n_targets} targets x {lanes} lanes x "
            f"{steps} steps); reduce --steps (or split the target set)")
    return lanes


def derive_m(n_value: int | None, k: int) -> int:
    """Reference parameter mapping (`keyhunt.cpp:1450-1607`): N keys per
    cycle (default 2^44), M = sqrt(N), baby table m = k*M. Validated
    against the n/k table exactly like the reference (`util.c:358-389`)."""
    from ..util import validate_nk, print_nk_table
    n = n_value if n_value else (1 << 44)
    if not validate_nk(n, k):
        print_nk_table()
        raise SystemExit(1)
    return k * (1 << ((n.bit_length() - 1) // 2))


def run_bsgs_cli(args) -> int:
    from ..cli import resolve_range, resolve_devices, parse_int
    from ..io import targets as tio

    # flag incompatibilities, exactly as the reference rejects them
    # (keyhunt.cpp:1185-1194)
    if getattr(args, "endomorphism", False):
        raise SystemExit("[E] Endomorphism doesn't work with BSGS")
    if parse_int(getattr(args, "stride", "1") or "1") != 1:
        raise SystemExit("[E] Stride doesn't work with BSGS")
    if not args.file:
        raise SystemExit("[E] -f FILE with public keys required")
    if not os.path.exists(args.file):
        raise SystemExit(f"[E] can't open file {args.file}")
    pts = tio.load_pubkeys_file(args.file)
    start, end = resolve_range(args)
    devices = resolve_devices(args)
    n_value = parse_int(args.nvalue) if args.nvalue else None
    m = derive_m(n_value, args.kfactor)
    print(f"[+] BSGS: {len(pts)} pubkeys, m={m:#x}, range {start:#x}:{end:#x}, "
          f"devices {devices}", flush=True)
    tdir = getattr(args, "tmpdir", ".")
    # --ptable PATH: explicit table file, overriding the m-keyed name in
    # --tmpdir (the role of the reference's --ptable file, keyhunt.cpp:1844).
    path = getattr(args, "ptable", None) or table_path(m, tdir)
    tbl = None
    if getattr(args, "dtable", False):
        # device-resident build: no disk, no upload (search.dtable)
        if args.save or getattr(args, "load_ptable", False):
            raise SystemExit("[E] --dtable builds in device memory; "
                             "-S/--load-ptable do not apply")
        if getattr(args, "table_partitions", 0) > 1 or devices > 1:
            raise SystemExit("[E] --dtable supports a single resident "
                             "device for now")
        from .dtable import build_device_table
        tbl = build_device_table(m, progress=not args.quiet)
    elif args.save or getattr(args, "load_ptable", False):
        tbl = load_table(m, path=path, verify=not args.skip_checksum)
        if tbl is not None:
            print(f"[+] loaded baby table {path}", flush=True)
        elif getattr(args, "load_ptable", False):
            raise SystemExit(f"[E] --load-ptable: no table {path}")
    if tbl is None:
        tbl = build_baby_table(m, progress=not args.quiet)
        if args.save:
            print(f"[+] saved baby table {save_table(tbl, path=path)}", flush=True)
    scheduler = args.bsgs_mode
    if getattr(args, "bsgs_block_count", 0) or getattr(args, "bsgs_block_size", 0):
        scheduler = "ggsb"                 # --bsgs-block-* implies -B ggsb
    # lane auto-sizing: the tuned chip geometry is 32768 lanes x 16 steps
    # (ground-truthed r3), but a small range should not build lanes it can
    # never use — size to cover the range in one dispatch, capped.
    steps = max(int(getattr(args, "steps", 16) or 16), 1)
    lanes = int(getattr(args, "lanes", 0) or 0)
    if lanes <= 0:
        while True:
            try:
                lanes = auto_lanes(m, steps, start, end, n_targets=len(pts))
                break
            except ValueError as e:
                # the 256-lane floor x target count exceeds the 2^21
                # queries/call ceiling: shed steps first, then give up
                if steps > 1:
                    steps = max(steps // 2, 1)
                    continue
                raise SystemExit(f"[E] {e}")
    cfg = BsgsConfig(m=m, lanes=lanes, steps=steps, scheduler=scheduler,
                     block_count=getattr(args, "bsgs_block_count", 0),
                     block_size=getattr(args, "bsgs_block_size", 0),
                     table_partitions=getattr(args, "table_partitions", 0))
    eng = BsgsEngine(cfg, tbl, pts, start, end, quiet=args.quiet,
                     stats_every=args.stats, matrix=args.matrix,
                     devices=devices)
    found = eng.run(max_seconds=args.max_seconds)
    print(f"[+] BSGS done: {len(found)}/{len(pts)} keys found", flush=True)
    return 0
