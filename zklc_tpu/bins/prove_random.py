"""Random-block prover CLI (bin/prove_random.rs:48,286 equivalent):
proof of a random block inside an epoch, artifacts under
proofs/random/<hash>/.  Inputs come from the epoch fixtures OR from the
NEAR RPC layer (near/rpc.py, `--rpc BLOCK_HASH`) — the backend's
getRandomProvingTask flow (near-helper.ts:135) with the epoch checkpoint
hashes read from the verifier contract.

Usage:
  python -m zklc_tpu.bins.prove_random EPOCH_I EPOCH_I-1 EPOCH_I-2 [--dev]
  python -m zklc_tpu.bins.prove_random --rpc BLOCK_HASH [--recording F]
"""
from __future__ import annotations

import argparse
import os


def prove_random_blocks(epoch_id_i: str, epoch_id_i_1: str,
                        epoch_id_i_2: str, data_dir: str, proofs_dir: str,
                        dev_mode: bool = False):
    from ..near import utils as U
    from ..service.orchestrator import Orchestrator
    from ..utils.timing import TimingTree

    timing = TimingTree("prove_random")
    with timing.scope("load fixtures"):
        epoch_blocks, blocks = U.set_blocks(
            epoch_id_i, epoch_id_i_1, epoch_id_i_2, data_dir=data_dir)
        validators = U.load_validators(
            os.path.join(U.epoch_dir(epoch_id_i, data_dir),
                         "validators.json"))
    orch = Orchestrator(proofs_dir=proofs_dir, dev_mode=dev_mode)
    with timing.scope("prove_block_bft"):
        row = orch.generate_proof(epoch_blocks, blocks[:5], validators,
                                  mode="random")
    timing.print()
    return row


def prove_random_block_rpc(block_hash_b58: str, proofs_dir: str,
                           dev_mode: bool = False, client=None,
                           eth_helper=None, recording: str | None = None):
    """RPC-driven path: assemble (epoch_blocks, blocks, validators) through
    near/rpc.py (utils.rs:78-246 + near-helper.ts task flow) and prove.

    `recording` replays a RecordedTransport JSON instead of live nodes;
    `eth_helper` defaults to the behavioral-twin contract model ONLY when a
    recording is used (live runs must pass the real EthHelper)."""
    from ..near import rpc as R
    from ..service.orchestrator import Orchestrator
    from ..utils.timing import TimingTree

    if client is None:
        transport = R.RecordedTransport(recording) if recording else None
        client = R.NearRpcClient(transport=transport)
    if eth_helper is None:
        if recording is None:
            raise ValueError("live RPC proving needs an EthHelper wired to "
                             "the verifier contract (eth_client.EthHelper)")
        # recorded runs: checkpoints served by the _STORED-fixture twin
        eth_helper = R.eth_twin_with_fixture_checkpoints()

    timing = TimingTree("prove_random_rpc")
    with timing.scope("rpc fetch"):
        epoch_blocks, blocks = R.set_blocks_from_rpc(client, block_hash_b58,
                                                     eth_helper)
        validators = R.load_validators_for_block(client, block_hash_b58)
    orch = Orchestrator(proofs_dir=proofs_dir, dev_mode=dev_mode)
    with timing.scope("prove_block_bft"):
        row = orch.generate_proof(epoch_blocks, blocks, validators,
                                  mode="random")
    timing.print()
    return row


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("epochs", nargs="*")
    p.add_argument("--rpc", metavar="BLOCK_HASH", default=None,
                   help="prove this block via the NEAR RPC layer instead "
                        "of fixture epochs")
    p.add_argument("--recording", default=None,
                   help="RecordedTransport JSON to replay instead of "
                        "live nodes")
    p.add_argument("--data-dir", default="/root/reference/data")
    p.add_argument("--proofs-dir", default="proofs")
    p.add_argument("--dev", action="store_true")
    args = p.parse_args(argv)
    if args.rpc:
        print(prove_random_block_rpc(args.rpc, proofs_dir=args.proofs_dir,
                                     dev_mode=args.dev,
                                     recording=args.recording))
        return
    if len(args.epochs) != 3:
        p.error("need 3 epoch ids (or --rpc BLOCK_HASH)")
    print(prove_random_blocks(*args.epochs, data_dir=args.data_dir,
                              proofs_dir=args.proofs_dir, dev_mode=args.dev))


if __name__ == "__main__":
    main()
