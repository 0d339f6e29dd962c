"""Epoch-chain prover CLI.

Equivalent of near_bft_finality/src/bin/prove_epoch.rs:46: walk the known
epochs in order, prove each epoch boundary from the previous epochs' stored
artifacts, persist `last_known_height.json` for resume (the reference's
checkpoint/resume mechanism, SURVEY.md §5).  The RPC discovery edge is a
pluggable callable (no egress here); fixtures drive the default path.

Usage: python -m zklc_tpu.bins.prove_epoch [--dev] [--data-dir D]
"""
from __future__ import annotations

import argparse
import json
import os


def prove_epoch_blocks(data_dir: str, proofs_dir: str,
                       dev_mode: bool = False):
    from ..near import utils as U
    from .prove_block import prove_block

    epochs = U.list_epochs(data_dir)
    state_path = os.path.join(proofs_dir, "epoch", "last_known_height.json")
    last_height = 0
    if os.path.exists(state_path):
        with open(state_path) as f:
            last_height = json.load(f).get("height", 0)

    rows = []
    # need E_i .. E_i-3: walk windows of four consecutive known epochs
    ordered = _order_epochs_by_height(epochs, data_dir)
    for i in range(3, len(ordered)):
        e_i, e_1, e_2, e_3 = (ordered[i], ordered[i - 1], ordered[i - 2],
                              ordered[i - 3])
        h = U.load_epoch_block(e_i, "block-0", data_dir).height
        if h <= last_height:
            continue
        rows.append(prove_block(e_i, e_1, e_2, e_3, data_dir=data_dir,
                                proofs_dir=proofs_dir, dev_mode=dev_mode))
        os.makedirs(os.path.dirname(state_path), exist_ok=True)
        with open(state_path, "w") as f:
            json.dump({"height": h}, f)
        last_height = h
    return rows


def _order_epochs_by_height(epochs, data_dir):
    from ..near import utils as U
    heights = {e: U.load_epoch_block(e, "block-0", data_dir).height
               for e in epochs}
    return sorted(epochs, key=lambda e: heights[e])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="/root/reference/data")
    p.add_argument("--proofs-dir", default="proofs")
    p.add_argument("--dev", action="store_true")
    args = p.parse_args(argv)
    for row in prove_epoch_blocks(args.data_dir, args.proofs_dir,
                                  dev_mode=args.dev):
        print(row)


if __name__ == "__main__":
    main()
