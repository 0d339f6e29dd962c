"""Header-hash DAG circuit: byte-exact public inputs vs real fixtures."""
import os

import pytest

from zklc_tpu.plonk.witness import generate_witness
from zklc_tpu.plonk.testing import check_constraints
from zklc_tpu.near import types as T
from zklc_tpu.near import header_hash as HH

DATA = "/root/reference/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference fixtures not mounted")


def test_header_hash_small_fixture():
    h = T.load_block_header(f"{DATA}/block_header_small.json")
    lds_off, lf_off = HH.rest_field_offsets(h)
    data, tg = HH.build_header_hash_circuit(
        len(h.inner_rest), "finality",
        last_ds_off=lds_off, last_final_off=lf_off)
    inputs = {}
    HH.set_header_hash_inputs(tg, h, inputs)
    wr = generate_witness(data, inputs)
    check_constraints(data, wr)
    got = [int(wr.get(t)) for t in data.public_input_targets]
    assert got == HH.expected_public_inputs(h, "finality")


def test_header_hash_epoch_mode():
    h = T.load_block_header(f"{DATA}/block_header_small.json")
    data, tg = HH.build_header_hash_circuit(len(h.inner_rest), "epoch")
    inputs = {}
    HH.set_header_hash_inputs(tg, h, inputs)
    wr = generate_witness(data, inputs)
    check_constraints(data, wr)
    got = [int(wr.get(t)) for t in data.public_input_targets]
    assert got == HH.expected_public_inputs(h, "epoch")
