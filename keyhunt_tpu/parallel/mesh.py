"""Device-mesh sharding of the key-range walker.

Parallelism mapping (SURVEY.md §2 table):
- data-parallel over keyspace: each device owns a contiguous key block and
  walks its own pivots (the reference's N-threads-pull-chunks scheme,
  `keyhunt.cpp:3313-3326`, without the mutex — blocks are statically
  disjoint);
- per-device lane-parallelism: the (A, W) batch of `search.walker`
  (reference: group-of-1024 + 4-way SSE);
- collectives: per-step global hit counts ride a `psum` so the host learns
  about any hit from a single replicated scalar; BSGS adds X-prefix table
  sharding with all-gather probes (see `search.bsgs`).

On a v5p pod slice the mesh axis spans all chips (ICI); under tests it is
the 8-device virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import curve
from ..search.walker import WalkerConfig, make_step_fn

AXIS = "kspace"


def make_mesh(n_devices: int | None = None, platform: str | None = None) -> Mesh:
    """Mesh over the default devices, falling back to the virtual CPU
    devices when the default platform has too few (single-chip dev boxes
    validating multi-chip sharding — the driver's dryrun path)."""
    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None and len(devs) < n_devices and platform is None:
        devs = jax.devices("cpu")
    if n_devices is not None:
        assert len(devs) >= n_devices, (
            f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def commit_to_mesh(arr, mesh: Mesh, spec):
    """Place a host array onto the mesh under `spec`. Single-process:
    return it unchanged (jit in_shardings commits it). Multi-process
    (jax.distributed): build a global array from per-process local shards
    — every host holds the same full numpy array (seeds and tables are
    computed deterministically on each host), so the callback just slices
    this process's addressable blocks."""
    if not isinstance(arr, np.ndarray):
        return arr                       # already a (global) device array
    if jax.process_count() == 1:
        return arr
    from jax.sharding import NamedSharding
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sh, lambda idx: np.ascontiguousarray(arr[idx]))


def make_sharded_step_fn(cfg: WalkerConfig, slab0, slab1, mesh: Mesh,
                         shift: int | None = None):
    """Jitted SPMD step over the mesh: pivot arrays are sharded along the
    pivot axis (one block of A pivots per device); each device probes its
    own key stripe against the REPLICATED bucket slabs (target tables are
    small next to the keyspace; replication beats an all-to-all here); hit
    indices stay device-local in the stacked output and the total count is
    psum'd so one scalar tells the host "anything anywhere?".

    Key layout (interleaved lanes, see search.walker): device d holds
    global pivots g = d*A..d*A+A-1, the offset table is strided by the
    global pivot count D*A, and inner step s covers keys
    k0 + (s*D*A*W + (j+1)*D*A + g + 1 - D*A)*stride. Every inner step
    advances ALL pivots by the global batch D*A*W (the advance point is
    the walker's own last offset column — free), so after S steps device d
    sits exactly one global span past its seed and chained calls stay
    contiguous without reseeding."""
    raw = make_step_fn(cfg, jit=False, advance_mult=mesh.devices.size,
                       shift=shift)
    nspec = P(None) if getattr(slab0, "ndim", 1) == 1 else P(None, None)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, AXIS), P(None, AXIS), nspec, nspec),
             out_specs=(P(None, AXIS), P(None, AXIS), P(), P()),
             # Pallas calls inside the body don't declare varying-mesh-axes
             # metadata; vma checking (default-on since jax 0.9) rejects them.
             check_vma=False)
    def sharded(px, py, t0c, t1c):
        px2, py2, packed = raw(px, py, t0c, t1c)
        total = jax.lax.psum(packed[:, -1].sum(), AXIS)
        # all-gather the (tiny) per-device hit rows so the host-bound
        # output is REPLICATED: every process of a multi-host run can
        # fetch it (a P(AXIS) output is only partially addressable there)
        packed_all = jax.lax.all_gather(packed, AXIS) \
            .reshape(mesh.devices.size * packed.shape[0], packed.shape[1])
        return px2, py2, packed_all, total[None]

    from jax.sharding import NamedSharding
    sh = NamedSharding(mesh, P(None, AXIS))
    shr = NamedSharding(mesh, nspec)
    # explicit in_shardings commit host/numpy inputs onto the mesh devices
    # even when they are not the process-default platform (CPU-mesh tests
    # under a TPU-default process).
    jitted = jax.jit(sharded, in_shardings=(sh, sh, shr, shr))
    s0c = commit_to_mesh(np.asarray(slab0), mesh, nspec)
    s1c = commit_to_mesh(np.asarray(slab1), mesh, nspec)
    fn = {"impl": jitted}          # swapped for the AOT executable by warmup

    def run(px, py):
        px = commit_to_mesh(px, mesh, P(None, AXIS))
        py = commit_to_mesh(py, mesh, P(None, AXIS))
        return fn["impl"](px, py, s0c, s1c)

    def warmup(px, py):
        """AOT-compile this process's step WITHOUT executing it (no
        collectives run), and keep the executable for later calls. Multi-
        process callers pair this with runtime.sync so compile skew on
        cold caches cannot race Gloo's ~30 s collective bring-up
        timeout."""
        px = commit_to_mesh(px, mesh, P(None, AXIS))
        py = commit_to_mesh(py, mesh, P(None, AXIS))
        fn["impl"] = jitted.lower(px, py, s0c, s1c).compile()

    run.warmup = warmup
    return run


def seed_pivots_sharded(cfg: WalkerConfig, k0: int, n_devices: int):
    """Host: (8, D*A) pivot arrays; global pivot g = d*A + a sits at key
    k0 + (g + 1 - D*A)*stride (interleaved-lane layout — see
    make_sharded_step_fn)."""
    ntot = n_devices * cfg.pivots
    keys = [k0 + (g + 1 - ntot) * cfg.stride for g in range(ntot)]
    x, y = curve.points_for_keys(keys)
    return x, y              # numpy: jit in_shardings place them on the mesh


def decode_sharded_hit(cfg: WalkerConfig, k0: int, device: int, step_idx: int,
                       flat_idx: int, n_devices: int):
    """Map a (device, step, flat) hit to (variant, key): the candidate
    space is (V, A, W) per device per step; global pivot g = d*A + a."""
    aw = cfg.batch
    A, W = cfg.pivots, cfg.width
    ntot = n_devices * A
    v = flat_idx // aw
    r = flat_idx % aw
    a, j = divmod(r, W)
    g = device * A + a
    key = k0 + (step_idx * n_devices * aw + (j + 1) * ntot
                + g + 1 - ntot) * cfg.stride
    return cfg.variants[v], key
