"""Device-side batched kernels: 256-bit field arithmetic, EC point ops,
hashing, and membership filters. Everything here operates on limb-major
uint32 arrays whose trailing axes are the batch and map onto TPU VPU lanes.
"""
