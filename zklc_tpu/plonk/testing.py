"""Debug/test helpers: direct constraint-satisfaction checking.

`check_constraints` evaluates every gate's constraint polynomials on every
row of a generated witness (filtered by the row's selector) — the same check
the quotient construction performs implicitly, exposed for gadget tests so
they can validate without running a full FRI prove.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from ..hash import poseidon as pos
from .algebra import HostBase, EvalVars
from .witness import generate_witness
from . import gates as G


def check_constraints(data, wr) -> None:
    """Raises AssertionError naming the first violated gate constraint."""
    wires = wr.wires
    common = data.common
    alg = HostBase()
    n = common.degree
    num_sel = common.num_selectors
    consts = data.constants_rows
    pi = np.array([wr.get(t) for t in data.public_input_targets],
                  dtype=np.uint64)
    pi_hash = pos.hash_no_pad(pi) if len(pi) else np.zeros(4, dtype=np.uint64)
    vars_ = EvalVars(
        local_constants=[consts[:, num_sel + i]
                         for i in range(common.num_constants - num_sel)],
        local_wires=[wires[:, i] for i in range(common.config.num_wires)],
        public_inputs_hash=[np.uint64(h) for h in pi_hash],
    )
    many = num_sel > 1
    for gi, gate in enumerate(common.gate_types):
        si = common.selector_indices[gi]
        start, end = common.selector_groups[si]
        s = consts[:, si]
        filt = np.ones(n, dtype=np.uint64)
        for k in range(start, end):
            if k == gi:
                continue
            filt = gl64.mul(filt, gl64.sub(np.uint64(k), s))
        if many:
            filt = gl64.mul(filt, gl64.sub(np.uint64(G.UNUSED_SELECTOR), s))
        for ci, c in enumerate(gate.eval_unfiltered(alg, vars_)):
            vals = gl64.mul(np.asarray(c, dtype=np.uint64), filt)
            bad = np.nonzero(vals)[0]
            assert bad.size == 0, (
                f"{gate.id()} constraint {ci} nonzero at rows {bad[:5]}")


def check_lookup(data, wr, delta: int = 0x1234567890ABCDEF) -> None:
    """Verify the LogUp grand-sum identity on the generated witness with a
    fixed test challenge: every active lane value must be in its table and
    sum_{lanes} 1/(d+f) == sum m/(d+t)."""
    common = data.common
    lk = common.lookup
    if lk is None:
        return
    from . import lookup as lk_mod
    wires = wr.wires
    m_cols = lk_mod.compute_multiplicities(lk, wires, data.constants_rows)
    active = data.constants_rows[:, lk.s_col].astype(bool)
    tables = lk_mod.table_constant_columns(lk, common.degree)
    p = gl64.P
    for ti, bits in enumerate(lk.cfg.tables):
        lhs = 0
        for c in lk.lane_cols[ti]:
            for v in wires[active, c]:
                lhs = (lhs + pow((delta + int(v)) % p, p - 2, p)) % p
        rhs = 0
        for row in range(1 << bits):
            m = int(m_cols[row, ti])
            if m:
                rhs = (rhs + m * pow((delta + int(tables[row, ti])) % p,
                                     p - 2, p)) % p
        assert lhs == rhs, f"LogUp sum mismatch for table {ti}"


def prove_check(builder, inputs: dict):
    """generate witness + constraint check; returns the WitnessResult."""
    data = builder.build()
    wr = generate_witness(data, inputs)
    check_constraints(data, wr)
    check_lookup(data, wr)
    return data, wr
