"""CircuitBuilder: targets, copy constraints, gate placement, build().

The TPU-first design principle (SURVEY.md §7.1): the builder is a host-side
*description* phase.  `build()` compiles the description into array-shaped
prover data — selector/constant/sigma polynomial value tables, a topological
witness program, and FRI parameters — which the device prover then consumes
as pure array math.  Mirrors the role of plonky2's `CircuitBuilder::build`
(reference pipeline call sites: near_bft_finality/src/prove_crypto/*.rs).

Target encoding (ints): wire(row, col) = row * 256 + col; virtual(i) = -1-i.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..field import gl64
from ..hash import poseidon as pos
from .config import CircuitConfig, FriParams
from . import gates as G

WIRE_STRIDE = 256


@dataclass
class GateInstance:
    gate: G.Gate
    constants: list


class DisjointSet:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


@dataclass
class CommonData:
    """Everything both prover and verifier need (cf. plonky2 CommonCircuitData
    / gnark-plonky2-verifier/types/common_circuit_data.json schema)."""
    config: CircuitConfig
    fri_params: FriParams
    gate_types: list            # sorted unique gate objects
    selector_indices: list      # per gate type -> selector column
    selector_groups: list       # list of (start, end) over gate-type indices
    quotient_degree_factor: int
    num_gate_constraints: int
    num_constants: int          # selectors + gate constants (+ s/table) cols
    num_public_inputs: int
    k_is: np.ndarray            # (num_routed_wires,) uint64
    lookup: object = None       # lookup.LookupInfo | None

    @property
    def degree_bits(self):
        return self.fri_params.degree_bits

    @property
    def degree(self):
        return 1 << self.fri_params.degree_bits

    @property
    def num_selectors(self):
        return len(self.selector_groups)

    @property
    def num_partial_products(self):
        routed = self.config.num_routed_wires
        q = self.quotient_degree_factor
        return (routed + q - 1) // q - 1

    @property
    def num_wire_polys(self):
        """Wire oracle width: circuit wires + lookup multiplicity columns."""
        extra = self.lookup.num_tables if self.lookup is not None else 0
        return self.config.num_wires + extra

    @property
    def lookup_block(self):
        """Per-challenge-round lookup rows in the zs_pp oracle."""
        return self.lookup.block_len if self.lookup is not None else 0

    @property
    def num_zspp_polys(self):
        nc = self.config.num_challenges
        return nc * (1 + self.num_partial_products) + nc * self.lookup_block


@dataclass
class ProverData:
    common: CommonData
    constants_rows: np.ndarray      # (n, num_constants) uint64 (selectors first)
    sigmas_rows: np.ndarray         # (n, num_routed_wires) uint64 (wire ids)
    wire_to_rep: dict               # wire position int -> representative target
    generators: list
    public_input_targets: list
    rep_of: dict                    # any target -> representative (snapshot fn)
    constants_sigmas_commitment: object = None   # filled lazily by prover
    circuit_digest: np.ndarray = None
    verifier_only: object = None


@dataclass
class VerifierOnlyData:
    constants_sigmas_cap: np.ndarray  # (2^cap_height, 4) uint64
    circuit_digest: np.ndarray        # (4,) uint64


class CircuitBuilder:
    def __init__(self, config: CircuitConfig = None):
        self.config = config or CircuitConfig.standard_recursion_config()
        self.gate_instances: list[GateInstance] = []
        self.ds = DisjointSet()
        self.virtual_count = 0
        self.public_inputs: list[int] = []
        self._constant_cache: dict[int, int] = {}
        self._free_arithmetic: dict[tuple, tuple] = {}
        self._free_constant: tuple | None = None
        self._free_slots: dict[str, tuple] = {}   # gate id -> (row, next_op)
        self._touched_wires: set[int] = set()
        self.generators: list[G.Generator] = []
        self._lookup_rows: list[int] = []
        self._built = False

    # -- targets ----------------------------------------------------------
    def wire_t(self, row: int, col: int) -> int:
        t = row * WIRE_STRIDE + col
        self._touched_wires.add(t)
        return t

    def add_virtual_target(self) -> int:
        self.virtual_count += 1
        return -self.virtual_count

    def add_virtual_targets(self, n: int) -> list[int]:
        return [self.add_virtual_target() for _ in range(n)]

    def connect(self, a: int, b: int):
        self.ds.union(a, b)

    def register_public_input(self, t: int):
        self.public_inputs.append(t)

    def register_public_inputs(self, ts):
        for t in ts:
            self.register_public_input(t)

    # -- gates ------------------------------------------------------------
    def add_gate(self, gate: G.Gate, constants=None) -> int:
        """Place a gate instance; returns its row."""
        assert not self._built
        constants = list(constants or [])
        assert gate.num_wires() <= self.config.num_wires, \
            f"{gate.id()} needs {gate.num_wires()} wires > {self.config.num_wires}"
        row = len(self.gate_instances)
        self.gate_instances.append(GateInstance(gate, constants))
        if gate.uses_lookup():
            assert self.config.lookup is not None, \
                f"{gate.id()} needs lookup lanes but config.lookup is None"
            self._lookup_rows.append(row)
        self.generators.extend(gate.generators(self, row, constants))
        return row

    def find_slot(self, gate: G.Gate) -> tuple:
        """Batched-op slot allocation for gates exposing `num_ops` and
        `op_input_wires(op)` (the plonky2 `find_slot` pattern)."""
        key = gate.id()
        slot = self._free_slots.get(key)
        if slot is None:
            row = self.add_gate(gate, [])
            slot = (row, 0)
        row, i = slot
        placed_gate = self.gate_instances[row].gate
        if i + 1 < placed_gate.num_ops:
            self._free_slots[key] = (row, i + 1)
        else:
            self._free_slots.pop(key, None)
        return row, i, placed_gate

    # -- constants / basic ops -------------------------------------------
    def constant(self, value: int) -> int:
        value = int(value) % gl64.P
        if value in self._constant_cache:
            return self._constant_cache[value]
        if self._free_constant is None:
            gate = G.ConstantGate(self.config.num_constants)
            row = self.add_gate(gate, [0] * self.config.num_constants)
            self._free_constant = (row, 0)
        row, slot = self._free_constant
        self.gate_instances[row].constants[slot] = value
        t = self.wire_t(row, slot)
        if slot + 1 < self.config.num_constants:
            self._free_constant = (row, slot + 1)
        else:
            self._free_constant = None
        self._constant_cache[value] = t
        return t

    def zero(self) -> int:
        return self.constant(0)

    def one(self) -> int:
        return self.constant(1)

    def arithmetic(self, c0: int, c1: int, x: int, y: int, z: int) -> int:
        """Returns target of c0*x*y + c1*z."""
        c0 = int(c0) % gl64.P
        c1 = int(c1) % gl64.P
        key = (c0, c1)
        slot = self._free_arithmetic.get(key)
        if slot is None:
            gate = G.ArithmeticGate.from_config(self.config)
            row = self.add_gate(gate, [c0, c1])
            slot = (row, 0)
        row, i = slot
        self.connect(x, self.wire_t(row, 4 * i))
        self.connect(y, self.wire_t(row, 4 * i + 1))
        self.connect(z, self.wire_t(row, 4 * i + 2))
        out = self.wire_t(row, 4 * i + 3)
        num_ops = self.gate_instances[row].gate.num_ops
        if i + 1 < num_ops:
            self._free_arithmetic[key] = (row, i + 1)
        else:
            self._free_arithmetic.pop(key, None)
        return out

    def add(self, a: int, b: int) -> int:
        return self.arithmetic(1, 1, a, self.one(), b)

    def sub(self, a: int, b: int) -> int:
        return self.arithmetic(1, gl64.P - 1, a, self.one(), b)

    def mul(self, a: int, b: int) -> int:
        return self.arithmetic(1, 0, a, b, self.zero())

    def mul_const(self, c: int, a: int) -> int:
        return self.arithmetic(c, 0, a, self.one(), self.zero())

    def mul_add(self, a: int, b: int, c: int) -> int:
        """a*b + c"""
        return self.arithmetic(1, 1, a, b, c)

    def mul_const_add(self, c0: int, a: int, b: int) -> int:
        """c0*a + b"""
        return self.arithmetic(c0, 1, a, self.one(), b)

    def assert_zero(self, a: int):
        self.connect(a, self.zero())

    def assert_one(self, a: int):
        self.connect(a, self.one())

    def is_equal_to_const_zero_check(self, a):
        raise NotImplementedError

    def select(self, b: int, x: int, y: int) -> int:
        """b ? x : y  =  b*(x - y) + y  (b assumed boolean)."""
        diff = self.sub(x, y)
        return self.mul_add(b, diff, y)

    def assert_bool(self, b: int):
        # b * b - b == 0  =>  arithmetic(1, -1, b, b, b) == 0
        t = self.arithmetic(1, gl64.P - 1, b, b, b)
        self.assert_zero(t)

    def random_access(self, index: int, items: list[int]) -> int:
        """Returns a target constrained to items[index] (power-of-two list;
        plonky2 RandomAccessGate)."""
        bits = (len(items) - 1).bit_length()
        assert len(items) == 1 << bits, "list length must be a power of two"
        gate = G.RandomAccessGate.from_config(self.config, bits)
        row, c, gate = self.find_slot(gate)
        self.connect(index, self.wire_t(row, gate.w_access_index(c)))
        for i, t in enumerate(items):
            self.connect(t, self.wire_t(row, gate.w_list_item(i, c)))
        return self.wire_t(row, gate.w_claimed(c))

    def add_generator(self, deps: list[int], outs: list[int], fn):
        """Attach a custom witness generator (hint)."""
        self.generators.append(G.Generator(deps, outs, fn))

    def is_equal(self, x: int, y: int) -> int:
        """Boolean target b = (x == y), via an inverse hint.

        Constraints: b*(x-y) == 0 and (x-y)*m + b == 1.
        """
        diff = self.sub(x, y)
        bt = self.add_virtual_target()
        m = self.add_virtual_target()

        def hint(vals):
            d = int(vals[0])
            if d % gl64.P == 0:
                return [np.uint64(1), np.uint64(0)]
            return [np.uint64(0), np.uint64(pow(d, gl64.P - 2, gl64.P))]

        self.generators.append(G.Generator([diff], [bt, m], hint,
                                           op=("IS_EQUAL", [])))
        self.assert_zero(self.mul(bt, diff))
        self.assert_one(self.mul_add(diff, m, bt))
        return bt

    def le_sum(self, bits: list[int]) -> int:
        """sum bits[i] * 2^i (bits assumed boolean)."""
        acc = self.zero()
        for bit in reversed(bits):
            acc = self.arithmetic(2, 1, acc, self.one(), bit)
        return acc

    def split_le(self, x: int, num_bits: int) -> list[int]:
        """Split into num_bits little-endian bits via BaseSumGate(base 2)."""
        assert num_bits <= 64
        gate = G.BaseSumGate(num_bits, 2)
        row = self.add_gate(gate)
        self.connect(x, self.wire_t(row, 0))
        return [self.wire_t(row, 1 + i) for i in range(num_bits)]

    # -- Poseidon gadget --------------------------------------------------
    def permute_swapped(self, inputs: list[int], swap: int) -> list[int]:
        """One PoseidonGate row: returns the 12 output wire targets."""
        gate = G.PoseidonGate()
        row = self.add_gate(gate)
        for i in range(12):
            self.connect(inputs[i], self.wire_t(row, gate.wire_input(i)))
        self.connect(swap, self.wire_t(row, gate.wire_swap()))
        return [self.wire_t(row, gate.wire_output(i)) for i in range(12)]

    def permute(self, inputs: list[int]) -> list[int]:
        return self.permute_swapped(inputs, self.zero())

    def hash_n_to_hash_no_pad(self, xs: list[int]) -> list[int]:
        """In-circuit plonky2 sponge (rate 8); returns 4 hash targets."""
        state = [self.zero()] * 12
        for start in range(0, len(xs), 8):
            chunk = xs[start: start + 8]
            state = list(state)
            for j, x in enumerate(chunk):
                state[j] = x
            state = self.permute(state)
        return state[:4]

    def hash_or_noop(self, xs: list[int]) -> list[int]:
        if len(xs) <= 4:
            return xs + [self.zero()] * (4 - len(xs))
        return self.hash_n_to_hash_no_pad(xs)

    # -- build ------------------------------------------------------------
    def build(self) -> ProverData:
        assert not self._built
        cfg = self.config

        # 1. in-circuit public-inputs hash routed into a PublicInputGate
        #    (required for soundness: binds PI targets to the claimed values).
        pi_hash_targets = self.hash_n_to_hash_no_pad(list(self.public_inputs))
        pi_gate = G.PublicInputGate()
        pi_row = self.add_gate(pi_gate)
        for i in range(4):
            self.connect(pi_hash_targets[i], self.wire_t(pi_row, i))

        # 1b. fill unused batched-op slots with zeros so their witness
        #     generators have resolvable dependencies.
        if self._free_arithmetic or self._free_slots:
            z = self.zero()
            for row, i in list(self._free_arithmetic.values()):
                num_ops = self.gate_instances[row].gate.num_ops
                for j in range(i, num_ops):
                    self.connect(z, self.wire_t(row, 4 * j))
                    self.connect(z, self.wire_t(row, 4 * j + 1))
                    self.connect(z, self.wire_t(row, 4 * j + 2))
            self._free_arithmetic.clear()
            for row, i in list(self._free_slots.values()):
                gate = self.gate_instances[row].gate
                for j in range(i, gate.num_ops):
                    for col in gate.op_input_wires(j):
                        self.connect(z, self.wire_t(row, col))
            self._free_slots.clear()

        self._built = True

        # 2. pad with noops to a power of two (lookup tables need at least
        #    2^max_table_bits rows to embed the table column)
        n_gates = len(self.gate_instances)
        degree_bits = max(2, (n_gates - 1).bit_length())
        if cfg.lookup is not None:
            degree_bits = max(degree_bits, max(cfg.lookup.tables))
        n = 1 << degree_bits
        noop = G.NoopGate()
        while len(self.gate_instances) < n:
            self.gate_instances.append(GateInstance(noop, []))

        # 3. gate types, sorted; selector grouping (greedy, plonky2 semantics:
        #    group_len + max_gate_degree <= max_degree + 1)
        seen = {}
        for inst in self.gate_instances:
            seen.setdefault(inst.gate.id(), inst.gate)
        gate_types = sorted(seen.values(), key=lambda g: g.sort_key())
        gate_index = {g.id(): i for i, g in enumerate(gate_types)}
        max_degree = cfg.max_quotient_degree_factor
        groups = []
        start = 0
        cur_max_deg = 0
        for i, g in enumerate(gate_types):
            new_max = max(cur_max_deg, g.degree())
            if (i - start + 1) + new_max > max_degree + 1:
                groups.append((start, i))
                start = i
                cur_max_deg = g.degree()
            else:
                cur_max_deg = new_max
        groups.append((start, len(gate_types)))
        selector_of_type = [None] * len(gate_types)
        for si, (s, e) in enumerate(groups):
            for gi in range(s, e):
                selector_of_type[gi] = si
        num_selectors = len(groups)

        # 4. constants table: [selector cols | gate-constant cols | lookup
        #    activity col | lookup table cols]
        max_gate_consts = max((inst.gate.num_constants()
                               for inst in self.gate_instances), default=0)
        num_gate_const_cols = max(cfg.num_constants, max_gate_consts)
        lookup_info = None
        num_lk_cols = 0
        if cfg.lookup is not None:
            from . import lookup as lk_mod
            lookup_info = lk_mod.make_info(cfg.lookup, cfg.num_wires,
                                           num_selectors, num_gate_const_cols)
            for bits in cfg.lookup.tables:
                assert bits <= degree_bits, (
                    f"lookup table 2^{bits} exceeds circuit size "
                    f"2^{degree_bits}")
            num_lk_cols = 1 + lookup_info.num_tables
        num_consts_total = num_selectors + num_gate_const_cols + num_lk_cols
        constants_rows = np.zeros((n, num_consts_total), dtype=np.uint64)
        constants_rows[:, :num_selectors] = G.UNUSED_SELECTOR
        for row, inst in enumerate(self.gate_instances):
            gi = gate_index[inst.gate.id()]
            si = selector_of_type[gi]
            constants_rows[row, si] = gi
            for k, c in enumerate(inst.constants):
                constants_rows[row, num_selectors + k] = int(c) % gl64.P
        if lookup_info is not None:
            from . import lookup as lk_mod
            constants_rows[self._lookup_rows, lookup_info.s_col] = 1
            constants_rows[:, list(lookup_info.table_cols)] = \
                lk_mod.table_constant_columns(lookup_info, n)

        # 5. sigmas: cycles over routed wire positions per copy class
        routed = cfg.num_routed_wires
        classes: dict[int, list[int]] = {}
        for t in self._touched_wires:
            col = t % WIRE_STRIDE
            row = t // WIRE_STRIDE
            if col < routed and row < n:
                classes.setdefault(self.ds.find(t), []).append(t)
        # wire id table: id(col, row) = k_col * g^row
        g_pow = gl64.powers(gl64.primitive_root_of_unity(degree_bits), n)
        k_is = gl64.powers(gl64.MULTIPLICATIVE_GROUP_GENERATOR, routed)
        sigmas_rows = np.empty((n, routed), dtype=np.uint64)
        # default: identity permutation
        sigmas_rows[:] = gl64.mul(k_is[None, :], g_pow[:, None])
        cur_list, nxt_list = [], []
        for members in classes.values():
            if len(members) < 2:
                continue
            members.sort()
            m = np.asarray(members, dtype=np.int64)
            cur_list.append(m)
            nxt_list.append(np.roll(m, -1))
        if cur_list:
            cur = np.concatenate(cur_list)
            nxt = np.concatenate(nxt_list)
            sigmas_rows[cur // WIRE_STRIDE, cur % WIRE_STRIDE] = \
                gl64.mul(k_is[nxt % WIRE_STRIDE], g_pow[nxt // WIRE_STRIDE])

        # 6. wire -> representative map (for witness matrix fill)
        wire_to_rep = {}
        for t in self._touched_wires:
            if t // WIRE_STRIDE < n:
                wire_to_rep[t] = self.ds.find(t)

        num_gate_constraints = max(g.num_constraints() for g in gate_types)
        common = CommonData(
            config=cfg,
            fri_params=cfg.fri_params(degree_bits),
            gate_types=gate_types,
            selector_indices=selector_of_type,
            selector_groups=groups,
            quotient_degree_factor=max_degree,
            num_gate_constraints=num_gate_constraints,
            num_constants=num_consts_total,
            num_public_inputs=len(self.public_inputs),
            k_is=k_is,
            lookup=lookup_info,
        )
        return ProverData(
            common=common,
            constants_rows=constants_rows,
            sigmas_rows=sigmas_rows,
            wire_to_rep=wire_to_rep,
            generators=self.generators,
            public_input_targets=list(self.public_inputs),
            rep_of=self.ds,
        )
