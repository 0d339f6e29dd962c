"""NEAR JSON-RPC client over a pluggable transport.

The reference talks to NEAR nodes from three places, all re-derived here:

  * `load_block_from_rpc` / `load_block_by_height_from_rpc` /
    `load_validators_from_rpc`
    (/root/reference/near_bft_finality/src/utils.rs:78,143,246) — block
    and EXPERIMENTAL_validators_ordered fetches;
  * `selectCorrectNode` + task builders
    (/root/reference/backend/src/near-helper.ts:26-148) — regular vs
    archival node failover on UNKNOWN_BLOCK / age, random + epoch proving
    task assembly against the on-chain checkpoints;
  * risc0's `set_blocks_from_rpc` / `set_validators_from_rpc`
    (/root/reference/near_risc0/lib/src/rpc.rs:503,591) — assembling the
    full BFT proving input (5 consecutive blocks + epoch blocks) from RPC.

Transport is pluggable (the service/eth_client.py ModelTransport pattern):
`HttpTransport` for live nodes, `RecordedTransport` for replaying recorded
responses in tests and air-gapped environments — requests are keyed by
(url, method, canonical params) so a recording is a faithful stub of the
node pair it was captured from.
"""
from __future__ import annotations

import json
import os

from .types import decode_hash, header_from_view, b58encode
from .utils import Validator, load_validators

MAINNET_RPC = "https://rpc.mainnet.near.org"
MAINNET_ARCHIVAL_RPC = "https://archival-rpc.mainnet.near.org"
BLOCKS_IN_EPOCH = 43200          # near-helper.ts:10 / types.rs EPOCH_DURATION


class RpcError(Exception):
    """JSON-RPC level error; `name` carries the cause (UNKNOWN_BLOCK,
    NOT_SYNCED_YET, ...) like near-helper.ts's BlockError taxonomy."""

    def __init__(self, message: str, name: str = "UNKNOWN"):
        super().__init__(message)
        self.name = name


def _request(method: str, params) -> dict:
    return {"jsonrpc": "2.0", "id": "dontcare", "method": method,
            "params": params}


def _error_name(resp: dict) -> str | None:
    err = resp.get("error")
    if not err:
        return None
    cause = err.get("cause") or {}
    return cause.get("name") or err.get("name") or "UNKNOWN"


class HttpTransport:
    """POST JSON to a NEAR node (reqwest/fetch equivalent)."""

    def __init__(self, timeout_s: float = 30.0):
        self.timeout_s = timeout_s

    def post(self, url: str, payload: dict) -> dict:
        import urllib.request
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
            return json.loads(r.read())


class RecordedTransport:
    """Replay recorded responses; optionally record through an inner
    transport (risc0's fixture-loader pattern made transport-shaped).

    Recording key: url + canonical JSON of (method, params)."""

    def __init__(self, recording: dict | str | None = None,
                 inner=None, record_path: str | None = None):
        if isinstance(recording, str):
            with open(recording) as f:
                recording = json.load(f)
        self.recording: dict = dict(recording or {})
        self.inner = inner
        self.record_path = record_path

    @staticmethod
    def key(url: str, payload: dict) -> str:
        return url + " " + json.dumps(
            {"method": payload["method"], "params": payload["params"]},
            sort_keys=True)

    def add(self, url: str, payload: dict, response: dict) -> None:
        self.recording[self.key(url, payload)] = response

    def post(self, url: str, payload: dict) -> dict:
        k = self.key(url, payload)
        if k in self.recording:
            return self.recording[k]
        if self.inner is None:
            raise RpcError(f"no recorded response for {k}", "UNRECORDED")
        resp = self.inner.post(url, payload)
        self.recording[k] = resp
        if self.record_path:
            with open(self.record_path, "w") as f:
                json.dump(self.recording, f)
        return resp


class NearRpcClient:
    """Stateful pair-of-nodes client with archival failover."""

    def __init__(self, rpc_url: str | None = None,
                 archival_url: str | None = None, transport=None):
        self.rpc_url = rpc_url or os.environ.get("NEAR_RPC", MAINNET_RPC)
        self.archival_url = archival_url or os.environ.get(
            "NEAR_ARCHIVAL_RPC", MAINNET_ARCHIVAL_RPC)
        self.transport = transport or HttpTransport()

    # -- raw calls --------------------------------------------------------

    def block_raw(self, block_id, url: str | None = None) -> dict:
        """`block` call; block_id is a base58 hash str, a height int, or a
        {"finality": ...} param dict."""
        params = block_id if isinstance(block_id, dict) \
            else {"block_id": block_id}
        return self.transport.post(url or self.rpc_url,
                                   _request("block", params))

    def validators_ordered_raw(self, block_hash: str | None,
                               url: str | None = None) -> dict:
        return self.transport.post(
            url or self.rpc_url,
            _request("EXPERIMENTAL_validators_ordered", [block_hash]))

    # -- node selection (near-helper.ts:26-118) ---------------------------

    def select_correct_node(self, block_id) -> str:
        """Return the node URL able to serve `block_id`: the regular node,
        falling back to archival on UNKNOWN_BLOCK or when the block is
        older than 3 epochs behind the optimistic head."""
        resp = self.block_raw(block_id)
        name = _error_name(resp)
        if name == "UNKNOWN_BLOCK":
            arch = self.block_raw(block_id, url=self.archival_url)
            aname = _error_name(arch)
            if aname == "UNKNOWN_BLOCK":
                raise RpcError(f"unknown block {block_id}", "UNKNOWN_BLOCK")
            if aname == "NOT_SYNCED_YET":
                raise RpcError("archival node not synced", "NOT_SYNCED_YET")
            return self.archival_url
        if name == "NOT_SYNCED_YET":
            raise RpcError("node not synced", "NOT_SYNCED_YET")
        if name:
            raise RpcError(f"rpc error {name}", name)
        latest = self.block_raw({"finality": "optimistic"},
                                url=self.archival_url)
        if _error_name(latest) is None and (
                resp["result"]["header"]["height"]
                < latest["result"]["header"]["height"]
                - BLOCKS_IN_EPOCH * 3):
            return self.archival_url
        return self.rpc_url

    # -- typed loaders (utils.rs:78,143,246) ------------------------------

    def _header(self, resp: dict):
        name = _error_name(resp)
        if name:
            raise RpcError(f"rpc error: {name}", name)
        return header_from_view(resp["result"]["header"])

    def load_block(self, hash_b58: str, url: str | None = None):
        """utils.rs:78 — (hash bytes, BlockHeader) by base58 hash."""
        hdr = self._header(self.block_raw(hash_b58, url=url))
        return hdr.hash, hdr

    def load_block_by_height(self, height: int, url: str | None = None):
        """utils.rs:143 — (hash bytes, BlockHeader) by height."""
        hdr = self._header(self.block_raw(int(height), url=url))
        return hdr.hash, hdr

    def load_validators(self, block_hash_b58: str | None,
                        url: str | None = None) -> list[Validator]:
        """utils.rs:246 — EXPERIMENTAL_validators_ordered as the same
        Validator rows the fixture loader produces."""
        resp = self.validators_ordered_raw(block_hash_b58, url=url)
        name = _error_name(resp)
        if name:
            raise RpcError(f"rpc error: {name}", name)
        from .types import decode_public_key
        return [Validator(account_id=v["account_id"],
                          public_key=decode_public_key(v["public_key"]),
                          stake=int(v["stake"]))
                for v in resp["result"]]


# ---------------------------------------------------------------------------
# proving-task assembly (near-helper.ts:135-198 + risc0 rpc.rs:327-591)
# ---------------------------------------------------------------------------

def random_proving_task(client: NearRpcClient, block_hash_b58: str,
                        eth_helper) -> dict:
    """near-helper.ts:135 getRandomProvingTask: resolve the target block's
    epoch to the on-chain checkpoint hashes of Block_0(E_i-1) /
    Block_n-1(E_i-2)."""
    url = client.select_correct_node(block_hash_b58)
    _, hdr = client.load_block(block_hash_b58, url=url)
    epoch_id_b58 = b58encode(hdr.epoch_id)
    _, ep_hdr = client.load_block(epoch_id_b58,
                                  url=client.select_correct_node(
                                      epoch_id_b58))
    saved_height = ep_hdr.height + 1
    prev_saved, cur_saved = eth_helper.get_epoch_hashes_by_height(
        saved_height)
    return {
        "current_block_hash": block_hash_b58,
        "previous_epoch_start_hash": cur_saved,   # Block_0(E_i-1)
        "previous_epoch_end_hash": prev_saved,    # Block_n-1(E_i-2)
        "node_url": url,
    }


def set_blocks_from_rpc(client: NearRpcClient, block_hash_b58: str,
                        eth_helper):
    """RPC-driven equivalent of utils.set_blocks for random mode (risc0
    rpc.rs:503 set_blocks_from_rpc): fetch B_i and its four
    consecutive-height successors, resolve the epoch blocks through the
    contract checkpoints, and return (epoch_blocks, blocks) in the exact
    shape bft.prove_block_bft consumes.

    The prev_hash chain is checked here (fail fast on forks/gaps — the
    BFT aggregation circuit would reject them anyway, hours later)."""
    task = random_proving_task(client, block_hash_b58, eth_helper)
    url = task["node_url"]
    _, b_i = client.load_block(block_hash_b58, url=url)
    chain = [b_i]
    for k in range(1, 5):
        _, nxt = client.load_block_by_height(b_i.height + k, url=url)
        if nxt.prev_hash != chain[-1].hash:
            raise RpcError(
                f"prev_hash chain broken at height {b_i.height + k}",
                "CHAIN_MISMATCH")
        chain.append(nxt)
    blocks = list(reversed(chain))            # [B_i+4 .. B_i]

    epoch_blocks = []
    for saved_b58 in (task["previous_epoch_start_hash"],
                      task["previous_epoch_end_hash"]):
        _, hdr = client.load_block(
            saved_b58, url=client.select_correct_node(saved_b58))
        epoch_blocks.append((decode_hash(saved_b58), hdr))
    return epoch_blocks, blocks


def load_validators_for_block(client: NearRpcClient,
                              block_hash_b58: str) -> list[Validator]:
    url = client.select_correct_node(block_hash_b58)
    return client.load_validators(block_hash_b58, url=url)


def eth_twin_with_fixture_checkpoints(data_dir: str = "/root/reference/data"):
    """Behavioral-twin EthHelper preloaded with the fixture `_STORED`
    hashes at the heights `random_proving_task` resolves — the reference's
    filesystem simulation of the contract checkpoints (utils.rs:340-355)
    made contract-shaped."""
    from . import utils as U
    from ..service.eth_client import EthHelper, ModelTransport
    from ..wrap.contracts_model import NearBlockVerificationModel
    helper = EthHelper(ModelTransport(
        NearBlockVerificationModel(verifier=None), sender="deployer"))
    eps = U.ordered_epochs(data_dir)
    for i in range(2, len(eps)):
        try:
            cur = U.load_stored_hash(eps[i - 1], "block-0", data_dir)
            prev = U.load_stored_hash(eps[i - 2], "block-last", data_dir)
            # epoch_id of E_i blocks == hash(Block_n-1(E_i-2)); the task
            # resolves that block's height + 1 (near-helper.ts:137-139)
            saved_height = U.load_epoch_block(eps[i - 2], "block-last",
                                              data_dir).height + 1
        except OSError:
            continue
        helper.save_epoch_hashes_and_set_checkpoint(
            b58encode(prev), b58encode(cur), saved_height)
    return helper


def build_recording_from_fixtures(data_dir: str = "/root/reference/data",
                                  rpc_url: str = MAINNET_RPC,
                                  archival_url: str = MAINNET_ARCHIVAL_RPC
                                  ) -> RecordedTransport:
    """A RecordedTransport stub serving every fixture header (by hash AND
    height) plus each epoch's validator set, as both nodes — the recorded
    double of the node pair, derived from the same `data/epochs` fixtures
    the reference's tests use."""
    from . import utils as U
    rt = RecordedTransport()
    for ep in U.list_epochs(data_dir):
        d = U.epoch_dir(ep, data_dir)
        for name in sorted(os.listdir(d)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(d, name)) as f:
                view = json.load(f)
            if name == "validators.json":
                if isinstance(view, dict) and "result" in view:
                    view = view["result"]
                resp = {"result": view}
                for url in (rpc_url, archival_url):
                    # the validator set is keyed by every block of the epoch
                    for bname in sorted(os.listdir(d)):
                        if bname.endswith(".json") and bname != "validators.json":
                            with open(os.path.join(d, bname)) as f:
                                bview = json.load(f)
                            rt.add(url, _request(
                                "EXPERIMENTAL_validators_ordered",
                                [bview["hash"]]), resp)
                continue
            resp = {"result": {"header": view}}
            for url in (rpc_url, archival_url):
                rt.add(url, _request("block", {"block_id": view["hash"]}),
                       resp)
                rt.add(url, _request("block", {"block_id": view["height"]}),
                       resp)
    return rt
