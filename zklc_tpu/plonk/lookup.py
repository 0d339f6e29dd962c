"""LogUp lookup argument: fractional-sum range checks over fixed tables.

TPU-first replacement for the reference's aux-limb range-check machinery
(crypto/plonky2_u32/src/gates/range_check_u32.rs base-4 decomposition and
arithmetic_u32.rs 2-bit limb planes): instead of spending 16-32 wires of
base-B limbs per checked value, a checked value occupies ONE "lane" wire
column and the protocol proves, via the logarithmic-derivative identity

    sum_{active rows, lanes} 1/(delta + f(x))  ==  sum_rows m(x)/(delta + t(x)),

that every lane value is a member of a fixed table t (e.g. [0, 2^16)).
Upstream plonky2 gained an equivalent LookupGate/LookupTableGate LogUp
protocol; this implementation is re-derived for this engine's column layout
(the verifying side is this framework's own verifier/recursion gadget, so
wire-format compatibility with plonky2's variant is not required — only the
outermost wrap proof must stay lookup-free for the gnark oracle).

Protocol layout
---------------
* Lane columns: the TOP `sum(lanes)` wire columns, grouped per table.  Only
  rows whose gate declares `uses_lookup()` participate ("active"); activity
  is a committed 0/1 CONSTANT column `s`, so non-lookup gates (Poseidon,
  arithmetic) may reuse the lane columns freely for their own wires.
* Table columns: one committed constant column per table with
  t_j(row) = row mod 2^bits_j.
* Multiplicity columns: one extra WIRE polynomial per table (appended after
  the circuit's wires), counting occurrences of each table value among the
  active lanes.  Committed with the wires, before the lookup challenges.
* Per Fiat-Shamir round ci (the engine's standard `num_challenges`-fold
  base-field-challenge amplification, same as the permutation argument):
  one challenge delta_ci, helper columns h_g with

      h_g * prod_{i in g}(delta + f_i) = s * sum_{j in g} prod_{i != j}(delta + f_i)

  (so h_g = s * sum_{i in g} 1/(delta + f_i), degree |g|+1 <= quotient
  degree factor), one helper h_t per table with h_t*(delta+t) = m, and a
  running sum Z with Z(omega x) = Z(x) + sum_g h_g(x) - sum_t h_t(x) and
  L_0 * Z = 0.  The update constraint holding on the wrap-around row forces
  the total fractional sum to zero.

All lookup columns are committed inside the existing zs_partial_products
oracle; openings extend the FRI batches at zeta (whole block) and
g*zeta (the lookup Zs).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import gl64
from . import poly_host as ph


@dataclass(frozen=True)
class LookupConfig:
    """Per-circuit lookup shape, chosen with the gate mix in mind."""
    tables: tuple            # bit widths per table, e.g. (16, 6)
    lanes: tuple             # lane columns per table, e.g. (110, 30)
    max_group: int = 7       # lanes combined per helper column (degree+1)

    @property
    def total_lanes(self) -> int:
        return sum(self.lanes)


@dataclass(frozen=True)
class LookupInfo:
    """Build-time derived layout stored in CommonData (verifier-visible)."""
    cfg: LookupConfig
    lane_cols: tuple         # per table: tuple of wire column indices
    s_col: int               # constants column: 1 on lookup-active rows
    table_cols: tuple        # constants column per table
    groups: tuple            # per helper: (table_idx, tuple of lane cols)

    @property
    def num_tables(self) -> int:
        return len(self.cfg.tables)

    @property
    def num_helpers(self) -> int:
        return len(self.groups)

    @property
    def block_len(self) -> int:
        """Per-round zs_pp rows: [Z, h_0..h_{NH-1}, ht_0..ht_{T-1}]."""
        return 1 + self.num_helpers + self.num_tables

    def num_constraints(self, num_challenges: int) -> int:
        # per round: L0*Z, helpers, table helpers, Z update
        return num_challenges * (1 + self.num_helpers + self.num_tables + 1)


def make_info(cfg: LookupConfig, num_wires: int, num_selectors: int,
              num_gate_const_cols: int) -> LookupInfo:
    """Lane columns at the top of the wire space; constants columns appended
    after [selectors | gate constants]."""
    total = cfg.total_lanes
    assert total <= num_wires, "lookup lanes exceed num_wires"
    lane_cols = []
    start = num_wires - total
    for ln in cfg.lanes:
        lane_cols.append(tuple(range(start, start + ln)))
        start += ln
    s_col = num_selectors + num_gate_const_cols
    table_cols = tuple(s_col + 1 + ti for ti in range(len(cfg.tables)))
    groups = []
    for ti, cols in enumerate(lane_cols):
        for g0 in range(0, len(cols), cfg.max_group):
            groups.append((ti, tuple(cols[g0: g0 + cfg.max_group])))
    return LookupInfo(cfg=cfg, lane_cols=tuple(lane_cols), s_col=s_col,
                      table_cols=tuple(table_cols), groups=tuple(groups))


def table_constant_columns(info: LookupInfo, n: int) -> np.ndarray:
    """(n, num_tables) uint64: t_j(row) = row mod 2^bits_j."""
    rows = np.arange(n, dtype=np.uint64)
    cols = [rows & np.uint64((1 << bits) - 1) for bits in info.cfg.tables]
    return np.stack(cols, axis=1)


# ---------------------------------------------------------------------------
# Witness side (host numpy)
# ---------------------------------------------------------------------------

class LookupRangeError(Exception):
    pass


def compute_multiplicities(info: LookupInfo, wires: np.ndarray,
                           constants_rows: np.ndarray) -> np.ndarray:
    """(n, num_tables) uint64 multiplicity columns for the honest witness.

    Raises LookupRangeError if an active lane holds an out-of-table value
    (a gadget bug — fail loudly at prove time, like the reference's
    witness-generation panics)."""
    n = wires.shape[0]
    active = constants_rows[:, info.s_col].astype(bool)
    out = np.zeros((n, info.num_tables), dtype=np.uint64)
    for ti, bits in enumerate(info.cfg.tables):
        size = 1 << bits
        assert size <= n, (
            f"table 2^{bits} does not fit in circuit of 2^{n.bit_length()-1}")
        vals = wires[active][:, list(info.lane_cols[ti])].ravel()
        if vals.size and int(vals.max()) >= size:
            bad = int(vals.max())
            raise LookupRangeError(
                f"lane value {bad} out of table range 2^{bits}")
        counts = np.bincount(vals.astype(np.int64), minlength=size)
        out[:size, ti] = counts.astype(np.uint64) % gl64.P
    return out


def compute_lookup_columns(info: LookupInfo, wires_m: np.ndarray,
                           constants_rows: np.ndarray,
                           deltas, num_wires: int) -> np.ndarray:
    """All lookup zs_pp rows: (num_challenges * block_len, n) uint64.

    wires_m: (n, num_wires + num_tables) — wires with multiplicity columns
    appended."""
    n = wires_m.shape[0]
    s = constants_rows[:, info.s_col] % np.uint64(2)
    active = s.astype(bool)
    tables = table_constant_columns(info, n)
    rows_out = []
    for delta in deltas:
        d = np.uint64(delta)
        hs = []
        for ti, cols in info.groups:
            f = wires_m[:, list(cols)]                    # (n, |g|)
            vals = gl64.add(f, d)
            # mask inactive rows to delta (f=0) — value irrelevant, h=0 there
            inv = ph.batch_inverse(
                np.where(active[:, None], vals, np.uint64(1)).ravel()
            ).reshape(vals.shape)
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(inv.shape[1]):
                acc = gl64.add(acc, inv[:, j])
            hs.append(np.where(active, acc, np.uint64(0)))
        hts = []
        for ti in range(info.num_tables):
            m = wires_m[:, num_wires + ti]
            denom = gl64.add(tables[:, ti], d)
            hts.append(gl64.mul(m, ph.batch_inverse(denom)))
        step = np.zeros(n, dtype=np.uint64)
        for h in hs:
            step = gl64.add(step, h)
        for ht in hts:
            step = gl64.sub(step, ht)
        # z[r] = sum_{i<r} step[i] mod p, via 32-bit-split exact cumsum
        # (partial sums of each half stay < 2^54 for n <= 2^22)
        lo = np.cumsum((step & np.uint64(0xFFFFFFFF)).astype(np.int64))
        hi = np.cumsum((step >> np.uint64(32)).astype(np.int64))
        tot = gl64.add(gl64.mul(hi.astype(np.uint64), np.uint64(1 << 32)),
                       lo.astype(np.uint64) % gl64.P)
        z = np.zeros(n, dtype=np.uint64)
        z[1:] = tot[:-1]
        rows_out.extend([z] + hs + hts)
    return np.stack(rows_out, axis=0)


# ---------------------------------------------------------------------------
# Constraint terms — written once against the algebra abstraction, evaluated
# on the LDE coset (host/device quotient), at zeta (CPU verifier) and as
# circuit construction (recursion).
# ---------------------------------------------------------------------------

def lookup_terms_one_round(alg, info: LookupInfo, wires_all, s_val,
                           table_vals, m_vals, block, z_next, delta, l0):
    """Constraint terms for one challenge round, fixed order:
    [L0*Z] + helpers + table-helpers + [Z update].

    wires_all: indexable by wire column (lane access);
    block: [Z, h_0.., ht_0..] values in zs_pp layout order;
    z_next: Z at the next row / g*zeta.
    """
    nh = info.num_helpers
    z = block[0]
    hs = block[1: 1 + nh]
    hts = block[1 + nh:]
    terms = [alg.mul(l0, z)]
    for gi, (ti, cols) in enumerate(info.groups):
        fs = [alg.add(delta, wires_all[c]) for c in cols]
        # prefix / suffix products for sum_j prod_{i != j}
        k = len(fs)
        pref = [alg.one()]
        for f in fs:
            pref.append(alg.mul(pref[-1], f))
        suf = [alg.one()]
        for f in reversed(fs):
            suf.append(alg.mul(suf[-1], f))
        suf.reverse()
        rhs = alg.zero()
        for j in range(k):
            rhs = alg.add(rhs, alg.mul(pref[j], suf[j + 1]))
        terms.append(alg.sub(alg.mul(hs[gi], pref[k]),
                             alg.mul(s_val, rhs)))
    for ti in range(info.num_tables):
        terms.append(alg.sub(
            alg.mul(hts[ti], alg.add(delta, table_vals[ti])), m_vals[ti]))
    upd = alg.sub(z_next, z)
    for h in hs:
        upd = alg.sub(upd, h)
    for ht in hts:
        upd = alg.add(upd, ht)
    terms.append(upd)
    return terms
