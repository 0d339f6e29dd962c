"""Dev-mode five-block BFT validation: synthetic chain + synthetic signers,
dev leaves/headers, full aggregation circuit witnessed and constraint-checked
(check_only path).  The real-proof path is identical modulo the leaf/header
provers; this validates every wire link in the BFT statement."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update('jax_platforms', 'cpu')
jax.config.update("jax_compilation_cache_dir", "/tmp/zklc_jax_cache_bft")
import numpy as np
from dataclasses import dataclass, field

from zklc_tpu.gadgets import ed25519_native as ed
from zklc_tpu.near.utils import Validator
from zklc_tpu.near import signatures as S
from zklc_tpu.near import bft


@dataclass
class FakeHeader:
    height: int
    hash: bytes
    prev_hash: bytes
    epoch_id: bytes
    next_epoch_id: bytes
    last_ds_final_block: bytes
    last_final_block: bytes
    next_bp_hash: bytes
    approvals: list
    inner_rest: bytes = b""


def H(n):  # deterministic 32-byte tag
    return bytes([n]) * 32


# synthetic validators (2 of 3 sign; stakes pass 2/3)
seeds = [bytes([i + 1]) * 32 for i in range(3)]
keys = [ed.keypair_from_seed(s) for s in seeds]
vals = [Validator(f"v{i}.near", b"\x00" + keys[i][1], stake)
        for i, stake in enumerate([500, 400, 100])]

ep2_hash = H(0xE2)   # hash of Block_n-1(E-2) == epoch_id of B_i
ep1_hash = H(0xE1)

heights = [105, 104, 103, 102, 101]   # B_i+4 .. B_i
hashes = [H(9), H(8), H(7), H(6), H(5)]
msg = S.generate_signed_message(101, 102, hashes[4])
sigs = {}
for i in (0, 1):
    sigs[i] = b"\x00" + ed.sign_message(msg, seeds[i])
approvals = [sigs.get(i) for i in range(3)]

blocks = []
for j in range(5):
    blocks.append(FakeHeader(
        height=heights[j], hash=hashes[j],
        prev_hash=hashes[j + 1] if j < 4 else H(4),
        epoch_id=ep2_hash, next_epoch_id=H(0xEE),
        last_ds_final_block=hashes[4] if j == 3 else H(0xD0 + j),
        last_final_block=hashes[4] if j == 2 else H(0xF0 + j),
        next_bp_hash=H(0xB0), approvals=approvals if j == 3 else []))

@dataclass
class FakeEpochHeader(FakeHeader):
    pass

# Block_0(E-1).next_bp_hash commits the validator set (bind_bp_hash link)
import hashlib
bp = hashlib.sha256(len(vals).to_bytes(4, "little")
                    + b"".join(v.serialize() for v in vals)).digest()
ep_blocks = [(ep1_hash, FakeHeader(1, ep1_hash, H(1), H(1), H(1), H(1), H(1), bp, [])),
             (ep2_hash, FakeHeader(2, ep2_hash, H(2), H(2), H(2), H(2), H(2), H(0xB2), []))]

t0 = time.perf_counter()
res = bft.prove_block_bft(ep_blocks, blocks, vals, dev_mode=True,
                          check_only=True, mode="random")
print(f"BFT dev check_only OK in {time.perf_counter()-t0:.0f}s", flush=True)
print("final PIs:", bytes(res.public_inputs[1:33]).hex()[:16], "...",
      "tag", res.public_inputs[0], flush=True)
assert bytes(res.public_inputs[1:33]) == hashes[4]
assert bytes(res.public_inputs[33:65]) == ep2_hash
assert bytes(res.public_inputs[65:97]) == ep1_hash
print("ALL LINKS VERIFIED", flush=True)
