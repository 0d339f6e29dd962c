"""NEAR RPC client over the recorded transport (near/rpc.py).

Mirrors the reference RPC surface — utils.rs:78/143/246 loaders,
near-helper.ts:26-118 node failover, :135 task builder, risc0
rpc.rs:503 set_blocks_from_rpc — replayed against recorded responses
built from the same data/epochs fixtures, with the on-chain checkpoint
side served by the behavioral-twin contract model."""
import json
import os.path as p

import pytest

from zklc_tpu.near import rpc as R, utils as U
from zklc_tpu.near.types import b58encode, decode_hash
from zklc_tpu.service.eth_client import EthHelper, ModelTransport
from zklc_tpu.wrap.contracts_model import NearBlockVerificationModel

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def recorded():
    return R.build_recording_from_fixtures()


@pytest.fixture(scope="module")
def client(recorded):
    return R.NearRpcClient(rpc_url=R.MAINNET_RPC,
                           archival_url=R.MAINNET_ARCHIVAL_RPC,
                           transport=recorded)


@pytest.fixture(scope="module")
def fixture_blocks():
    eps = U.ordered_epochs()
    epoch_blocks, blocks = U.set_blocks(eps[-1], eps[-2], eps[-3])
    return eps, epoch_blocks, blocks


def _latest_response(height: int) -> dict:
    return {"result": {"header": {"height": height}}}


def test_load_block_by_hash_and_height(client, fixture_blocks):
    _, _, blocks = fixture_blocks
    b_i = blocks[4]
    h, hdr = client.load_block(b58encode(b_i.hash))
    assert h == b_i.hash and hdr.height == b_i.height
    assert hdr.computed_hash() == b_i.hash        # utils.rs hash recompute
    h2, hdr2 = client.load_block_by_height(b_i.height)
    assert h2 == b_i.hash and hdr2.prev_hash == hdr.prev_hash


def test_load_validators_matches_fixture_loader(client, fixture_blocks):
    eps, _, blocks = fixture_blocks
    want = U.load_validators(p.join(U.epoch_dir(eps[-1]),
                                    "validators.json"))
    got = client.load_validators(b58encode(blocks[4].hash))
    assert len(got) == len(want)
    assert all(g == w for g, w in zip(got, want))


def test_unknown_block_raises(client):
    with pytest.raises(R.RpcError) as ei:
        client.load_block("1" * 44)
    assert ei.value.name == "UNRECORDED"          # no such recording


def test_failover_unknown_on_regular(fixture_blocks):
    """Regular node lacks the block -> archival serves it (ts:26-80)."""
    _, _, blocks = fixture_blocks
    b_i = blocks[4]
    hash_b58 = b58encode(b_i.hash)
    rt = R.RecordedTransport()
    req = {"jsonrpc": "2.0", "id": "dontcare", "method": "block",
           "params": {"block_id": hash_b58}}
    rt.add("http://regular", req,
           {"error": {"cause": {"name": "UNKNOWN_BLOCK"}}})
    rt.add("http://archival", req, {"result": {"header": b_i.view}})
    c = R.NearRpcClient("http://regular", "http://archival", transport=rt)
    assert c.select_correct_node(hash_b58) == "http://archival"


def test_failover_unknown_everywhere(fixture_blocks):
    _, _, blocks = fixture_blocks
    hash_b58 = b58encode(blocks[4].hash)
    rt = R.RecordedTransport()
    req = {"jsonrpc": "2.0", "id": "dontcare", "method": "block",
           "params": {"block_id": hash_b58}}
    err = {"error": {"cause": {"name": "UNKNOWN_BLOCK"}}}
    rt.add("http://regular", req, err)
    rt.add("http://archival", req, err)
    c = R.NearRpcClient("http://regular", "http://archival", transport=rt)
    with pytest.raises(R.RpcError) as ei:
        c.select_correct_node(hash_b58)
    assert ei.value.name == "UNKNOWN_BLOCK"


def test_failover_old_block_uses_archival(fixture_blocks):
    """Block older than 3 epochs behind the optimistic head -> archival
    (near-helper.ts:83-105)."""
    _, _, blocks = fixture_blocks
    b_i = blocks[4]
    hash_b58 = b58encode(b_i.hash)
    rt = R.RecordedTransport()
    req = {"jsonrpc": "2.0", "id": "dontcare", "method": "block",
           "params": {"block_id": hash_b58}}
    rt.add("http://regular", req, {"result": {"header": b_i.view}})
    latest = {"jsonrpc": "2.0", "id": "dontcare", "method": "block",
              "params": {"finality": "optimistic"}}
    rt.add("http://archival", latest,
           _latest_response(b_i.height + R.BLOCKS_IN_EPOCH * 4))
    c = R.NearRpcClient("http://regular", "http://archival", transport=rt)
    assert c.select_correct_node(hash_b58) == "http://archival"
    # fresh head -> regular node is fine
    rt.add("http://archival", latest, _latest_response(b_i.height + 10))
    assert c.select_correct_node(hash_b58) == "http://regular"


@pytest.fixture(scope="module")
def eth_with_checkpoints(client, fixture_blocks):
    """Contract twin preloaded with the fixture epochs' stored hashes at
    the height random_proving_task resolves (epoch-boundary block + 1)."""
    eps, epoch_blocks, blocks = fixture_blocks
    helper = EthHelper(ModelTransport(NearBlockVerificationModel(
        verifier=None), sender="deployer"))
    b_i = blocks[4]
    _, ep_hdr = client.load_block(b58encode(b_i.epoch_id))
    saved_height = ep_hdr.height + 1
    cur = b58encode(epoch_blocks[0][0])       # Block_0(E_i-1) stored hash
    prev = b58encode(epoch_blocks[1][0])      # Block_n-1(E_i-2) stored hash
    helper.save_epoch_hashes_and_set_checkpoint(prev, cur, saved_height)
    return helper


def test_random_proving_task(client, fixture_blocks, eth_with_checkpoints):
    _, epoch_blocks, blocks = fixture_blocks
    # add the optimistic-head response node selection wants
    client.transport.add(
        R.MAINNET_ARCHIVAL_RPC,
        {"jsonrpc": "2.0", "id": "dontcare", "method": "block",
         "params": {"finality": "optimistic"}},
        _latest_response(blocks[0].height + 5))
    task = R.random_proving_task(client, b58encode(blocks[4].hash),
                                 eth_with_checkpoints)
    assert task["previous_epoch_start_hash"] == b58encode(
        epoch_blocks[0][0])
    assert task["previous_epoch_end_hash"] == b58encode(epoch_blocks[1][0])


def test_prove_random_rpc_bin_path(tmp_path, monkeypatch, recorded,
                                   fixture_blocks):
    """`python -m zklc_tpu.bins.prove_random --rpc HASH --recording F`:
    the full bin path (recording file -> RecordedTransport ->
    set_blocks_from_rpc -> _STORED-checkpoint twin -> orchestrator) with
    the prover stubbed to capture its inputs."""
    from zklc_tpu.bins import prove_random as PR
    from zklc_tpu.service.orchestrator import Orchestrator

    _, want_eb, want_blocks = fixture_blocks
    rec = dict(recorded.recording)
    rec[R.RecordedTransport.key(
        R.MAINNET_ARCHIVAL_RPC,
        {"jsonrpc": "2.0", "id": "dontcare", "method": "block",
         "params": {"finality": "optimistic"}})] = _latest_response(
        want_blocks[0].height + 5)
    rec_file = tmp_path / "recording.json"
    rec_file.write_text(json.dumps(rec))

    captured = {}

    def fake_generate(self, epoch_blocks, blocks, validators, mode="random",
                      **kw):
        captured.update(epoch_blocks=epoch_blocks, blocks=blocks,
                        validators=validators, mode=mode)
        return {"status": "DONE"}

    monkeypatch.setattr(Orchestrator, "generate_proof", fake_generate)
    row = PR.prove_random_block_rpc(b58encode(want_blocks[4].hash),
                                    proofs_dir=str(tmp_path),
                                    recording=str(rec_file))
    assert row == {"status": "DONE"} and captured["mode"] == "random"
    assert [h.hash for h in captured["blocks"]] == \
        [h.hash for h in want_blocks]
    assert [(bytes(s), h.hash) for s, h in captured["epoch_blocks"]] == \
        [(bytes(s), h.hash) for s, h in want_eb]
    assert len(captured["validators"]) == 100


def test_set_blocks_from_rpc_matches_fixture_loader(
        client, fixture_blocks, eth_with_checkpoints):
    """The RPC assembly returns byte-identical inputs to utils.set_blocks
    — the property that makes `--rpc` and fixture proving interchangeable."""
    _, want_eb, want_blocks = fixture_blocks
    got_eb, got_blocks = R.set_blocks_from_rpc(
        client, b58encode(want_blocks[4].hash), eth_with_checkpoints)
    assert [h.hash for h in got_blocks] == [h.hash for h in want_blocks]
    assert [(s, h.hash) for s, h in got_eb] == \
        [(bytes(s), h.hash) for s, h in want_eb]
    # full input equality, not just hashes
    assert [h.full_bytes() for h in got_blocks] == \
        [h.full_bytes() for h in want_blocks]
