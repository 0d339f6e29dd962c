"""Witness generation: worklist scheduler over generators + copy constraints.

TPU-first note (SURVEY.md §7.1): witness generation is the cheap, irregular
part of proving — it runs on host (numpy u64) as a dependency-scheduled
program; the expensive regular math (NTT/Poseidon/FRI) runs on device.  For
batch proving (many signatures over one circuit) the same schedule executes
vectorized over the batch axis.
"""
from __future__ import annotations

from collections import deque

import numpy as np

from .builder import ProverData, WIRE_STRIDE


class WitnessConflict(Exception):
    pass


class WitnessResult:
    __slots__ = ("wires", "values", "ds")

    def __init__(self, wires, values, ds):
        self.wires = wires
        self.values = values
        self.ds = ds

    def get(self, target: int):
        return self.values.get(self.ds.find(target), np.uint64(0))


try:
    from .. import native as _native
    _NATIVE = _native if _native.available else None
except Exception:  # pragma: no cover
    _NATIVE = None


def generate_witness(data: ProverData, inputs: dict) -> "WitnessResult":
    """inputs: {target: value}.  Returns wires (n, num_wires) + value lookup.

    With the native library present, compiles the generator list to a typed
    instruction tape once per (circuit, seeded-target-set) and executes it
    in C++ (witness_tape.py); the Python worklist below is the reference
    implementation and fallback.
    """
    if _NATIVE is not None:
        from . import witness_tape as wt
        seed_key = frozenset(data.rep_of.find(t) for t in inputs)
        tapes = getattr(data, "_tapes", None)
        if tapes is None:
            tapes = {}
            data._tapes = tapes
        tape = tapes.get(seed_key)
        try:
            if tape is None:
                path = wt.tape_cache_path(data, seed_key)
                tape = wt.load_tape(path, data, seed_key)
                if tape is None:
                    tape = wt.compile_tape(data, inputs.keys())
                    wt.save_tape(tape, path)
                tapes[seed_key] = tape
            return wt.execute_tape(tape, data, inputs)
        except wt.TapeConflict as e:
            raise WitnessConflict(str(e)) from e
        except wt.TapeStall as e:
            raise WitnessConflict(str(e)) from e
    ds = data.rep_of
    values: dict[int, np.uint64] = {}

    def set_target(t, v):
        rep = ds.find(t)
        v = np.uint64(int(v) % (2**64))
        old = values.get(rep)
        if old is not None:
            if old != v:
                raise WitnessConflict(f"target {t}: {old} != {v}")
            return False
        values[rep] = v
        return True

    # index generators by unmet dependencies
    gens = data.generators
    dep_reps = []
    watchers: dict[int, list[int]] = {}
    remaining = []
    for gi, g in enumerate(gens):
        reps = [ds.find(d) for d in g.deps]
        dep_reps.append(reps)
        remaining.append(0)

    for t, v in inputs.items():
        set_target(t, v)

    ready = deque()
    for gi, g in enumerate(gens):
        cnt = 0
        for rep in dep_reps[gi]:
            if rep not in values:
                cnt += 1
                watchers.setdefault(rep, []).append(gi)
        remaining[gi] = cnt
        if cnt == 0:
            ready.append(gi)

    ran = [False] * len(gens)
    n_ran = 0
    while ready:
        gi = ready.popleft()
        if ran[gi]:
            continue
        ran[gi] = True
        n_ran += 1
        g = gens[gi]
        vals = [values[r] for r in dep_reps[gi]]
        outs = g.fn(vals)
        for t, v in zip(g.outs, outs):
            rep = ds.find(t)
            if set_target(t, v):
                for wgi in watchers.get(rep, ()):  # wake watchers
                    remaining[wgi] -= 1
                    if remaining[wgi] == 0:
                        ready.append(wgi)

    if n_ran != len(gens):
        stuck = [gi for gi in range(len(gens)) if not ran[gi]]
        raise WitnessConflict(
            f"{len(stuck)} generators never ran (missing inputs?); first "
            f"stuck generator deps: {gens[stuck[0]].deps[:8]}")

    n = data.common.degree
    num_wires = data.common.config.num_wires
    wires = np.zeros((n, num_wires), dtype=np.uint64)
    for t, rep in data.wire_to_rep.items():
        v = values.get(rep)
        if v is not None:
            wires[t // WIRE_STRIDE, t % WIRE_STRIDE] = v
    return WitnessResult(wires, values, ds)
