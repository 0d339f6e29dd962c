"""zklc_tpu — TPU-native zero-knowledge proving framework for the NEAR light client.

A from-scratch JAX/XLA/Pallas re-design of the proving stack used by
ZpokenWeb3/zk-light-client-implementation (reference mounted at /root/reference):
a Plonky2-style SNARK over the Goldilocks field with FRI commitments, the u32 /
SHA-256 / SHA-512 / ed25519 circuit gadget layers, recursive aggregation, and
the five-block NEAR BFT-finality pipeline on top.

Architecture (TPU-first, not a port):
  - field/    Goldilocks p = 2^64 - 2^32 + 1: host numpy-u64 kernels and
              device 2xuint32 structure-of-arrays kernels (TPU int lanes are
              32-bit; 64-bit values live as (hi, lo) uint32 planes).
  - ops/      Hot device ops: radix-2 NTT/LDE, Poseidon permutation, Merkle
              tree construction, FRI fold — jnp/Pallas, batched, static shapes.
  - hash/     Host-side Poseidon / SHA primitives and the Fiat-Shamir
              challenger (duplex sponge).
  - plonk/    The constraint system: gates, circuit builder, prover, verifier.
  - gadgets/  u32 arithmetic, biguint, SHA-256/SHA-512, nonnative ed25519.
  - near/     NEAR BFT pipeline: header layouts, primitives, signatures,
              keys & stakes, five-block finality driver.
  - parallel/ Mesh/sharding layer: signature batch axis over chips, sharded
              NTT, reduction trees (jax.sharding + shard_map).
"""

__version__ = "0.1.0"

from . import runtime as _runtime  # noqa: F401  (persistent XLA cache)
