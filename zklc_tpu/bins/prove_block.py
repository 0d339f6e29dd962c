"""Fixture-driven epoch-block prover CLI.

Equivalent of near_bft_finality/src/bin/prove_block.rs:188,491: load the
epoch fixtures (data/epochs/<id>/...), run the five-block BFT prover for the
epoch blocks, write artifacts under proofs/epoch/<hash>/.

Usage:
  python -m zklc_tpu.bins.prove_block E_I E_I-1 E_I-2 E_I-3 [--dev]
"""
from __future__ import annotations

import argparse
import os
import sys


def prove_block(epoch_id_i: str, epoch_id_i_1: str, epoch_id_i_2: str,
                epoch_id_i_3: str, data_dir: str, proofs_dir: str,
                dev_mode: bool = False):
    from ..near import utils as U
    from ..near import bft
    from ..service.orchestrator import Orchestrator
    from ..utils.timing import TimingTree

    timing = TimingTree("prove_block")
    with timing.scope("load fixtures"):
        epoch_blocks, blocks = U.set_blocks(
            epoch_id_i, epoch_id_i_1, epoch_id_i_2, epoch_id_i_3,
            data_dir=data_dir)
        validators = U.load_validators(
            os.path.join(U.epoch_dir(epoch_id_i, data_dir),
                         "validators.json"))
        validators_n_1 = U.load_validators(
            os.path.join(U.epoch_dir(epoch_id_i_1, data_dir),
                         "validators.json"))
    orch = Orchestrator(proofs_dir=proofs_dir, dev_mode=dev_mode)
    with timing.scope("prove_block_bft"):
        row = orch.generate_proof(epoch_blocks, blocks, validators,
                                  mode="epoch",
                                  validators_n_1=validators_n_1)
    timing.print()
    return row


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("epochs", nargs=4,
                   help="epoch ids: E_i E_i-1 E_i-2 E_i-3 (base58)")
    p.add_argument("--data-dir", default="/root/reference/data")
    p.add_argument("--proofs-dir", default="proofs")
    p.add_argument("--dev", action="store_true",
                   help="dev-mode leaf/header provers (test topology only)")
    args = p.parse_args(argv)
    row = prove_block(*args.epochs, data_dir=args.data_dir,
                      proofs_dir=args.proofs_dir, dev_mode=args.dev)
    print(row)


if __name__ == "__main__":
    main()
