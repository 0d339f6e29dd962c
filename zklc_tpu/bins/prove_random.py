"""Random-block prover CLI (bin/prove_random.rs:48,286 equivalent):
fixture-driven proof of a random block inside an epoch, artifacts under
proofs/random/<hash>/.

Usage: python -m zklc_tpu.bins.prove_random EPOCH_I EPOCH_I-1 EPOCH_I-2 [--dev]
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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("epochs", nargs=3)
    p.add_argument("--data-dir", default="/root/reference/data")
    p.add_argument("--proofs-dir", default="proofs")
    p.add_argument("--dev", action="store_true")
    args = p.parse_args(argv)
    print(prove_random_blocks(*args.epochs, data_dir=args.data_dir,
                              proofs_dir=args.proofs_dir, dev_mode=args.dev))


if __name__ == "__main__":
    main()
