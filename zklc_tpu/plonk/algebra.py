"""Field-algebra abstraction for gate constraint evaluation.

Every gate's constraint polynomials are written ONCE against this interface
and evaluated in three contexts:

  - `HostBase`  : numpy uint64 over witness rows (debug constraint checks),
  - `DeviceBase`: jnp (hi, lo) uint32 pairs over all LDE points (the prover's
                  quotient computation — the TPU hot path),
  - `HostExt`   : numpy (..., 2) quadratic-extension values at zeta (the CPU
                  verifier's vanishing-polynomial check).

This mirrors how the reference evaluates the same gate formulas both
natively and in-circuit (SURVEY.md §2.5 gate evaluators), but organized
around vectorized array math instead of per-constraint object graphs.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from ..field import gl2x32 as gl


class HostBase:
    """Scalars are numpy uint64 arrays (broadcastable)."""

    def add(self, a, b):
        return gl64.add(a, b)

    def sub(self, a, b):
        return gl64.sub(a, b)

    def mul(self, a, b):
        return gl64.mul(a, b)

    def const(self, c: int):
        return np.uint64(int(c) % gl64.P)

    def zero(self):
        return np.uint64(0)

    def one(self):
        return np.uint64(1)

    def from_base(self, b):
        """Lift a base-field numpy value into this algebra (identity here)."""
        return np.asarray(b, dtype=np.uint64)


class HostExt:
    """Scalars are numpy (..., 2) uint64 quadratic-extension values."""

    def add(self, a, b):
        return gl64.ext_add(a, b)

    def sub(self, a, b):
        return gl64.ext_sub(a, b)

    def mul(self, a, b):
        return gl64.ext_mul(a, b)

    def const(self, c: int):
        return np.array([int(c) % gl64.P, 0], dtype=np.uint64)

    def zero(self):
        return np.zeros(2, dtype=np.uint64)

    def one(self):
        return np.array([1, 0], dtype=np.uint64)

    def from_base(self, b):
        b = np.asarray(b, dtype=np.uint64)
        return np.stack([b, np.zeros_like(b)], axis=-1)


class DeviceBase:
    """Scalars are (hi, lo) uint32 jnp array pairs (any broadcast shape)."""

    def add(self, a, b):
        return gl.add(a, b)

    def sub(self, a, b):
        return gl.sub(a, b)

    def mul(self, a, b):
        return gl.mul(a, b)

    def const(self, c: int):
        return gl.full((), c)

    def zero(self):
        return gl.zeros(())

    def one(self):
        return gl.ones(())

    def from_base(self, b):
        """b is already a (hi, lo) pair on device."""
        return b


class EvalVars:
    """Evaluation context handed to gates: constants AFTER selector removal,
    all local wires, and the 4-element public-inputs hash (base field values
    lifted into the algebra by the caller)."""

    __slots__ = ("local_constants", "local_wires", "public_inputs_hash")

    def __init__(self, local_constants, local_wires, public_inputs_hash):
        self.local_constants = local_constants
        self.local_wires = local_wires
        self.public_inputs_hash = public_inputs_hash
