"""keyhunt_tpu — a TPU-native secp256k1 key-search engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
`keyhunt` CPU tool (reference: naanprofit/keyhunt): brute-force scanning of
private-key ranges against hash160 / address / X-coordinate / Ethereum
targets, and Baby-Step Giant-Step (BSGS) search against known public keys —
redesigned TPU-first:

- 256-bit field elements are limb-major ``(8, ...)`` uint32 arrays so the
  batch axis maps onto VPU lanes (reference uses 5x64 limbs per scalar,
  `secp256k1/Int.h:27-38`).
- Batched modular inversion (Montgomery's trick, `secp256k1/IntGroup.cpp:36-57`)
  becomes two `lax.associative_scan` product sweeps + one Fermat inversion.
- The group-of-1024 point walk (`keyhunt.cpp:3348-3856`) becomes a 2-D
  pivot x offset batched affine add, tens of thousands of points per
  batched inversion.
- Multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` over key ranges
  and X-prefix-sharded membership tables instead of pthreads + TCP.
"""

__version__ = "0.1.0"
