"""Distributed approval proving over the cross-process broker.

Equivalent of `prove_approvals_with_client`
(/root/reference/near_bft_finality/src/prove_block_data/signatures.rs:144-274)
and the NATS task contracts `InputTask`/`OutputTask`
(/root/reference/near_bft_finality/src/types.rs:172-192): leaf proving
tasks cross process/machine boundaries as serialized bytes through the
durable work-queue broker (service/transport.py), worker processes prove
and publish proof bytes back, and the parent folds the returned proofs.

Framework redesign vs the reference:

  * tasks carry a BATCH of K signatures (the BATCH_K EdDSA leaf circuit),
    not one signature each;
  * the parent reassembles leaves in VALIDATOR-INDEX order and folds them
    through the balanced recursion tree (signatures.fold_proof_tree) — the
    reference folds in arrival order, which is sound for the fold but
    makes the aggregate's PI layout racy; index order keeps the
    aggregation circuit's leaf-slot wiring (bft._wire_signature_links)
    deterministic;
  * worker death is NOT a deadlock: unacked tasks redeliver after the
    broker's visibility timeout (the liveness hole of
    signatures.rs:218-222, fixed at the transport layer), and duplicate
    results from redelivery are deduped by leaf start index;
  * every returned proof is CPU-verified before folding (the reference
    trusts worker bytes until the fold fails).

Wire schema (JSON, one object per message):
  task:   {"mode":"batch"|"dev", "message":hex,
           "sig_pks":[[sig_hex,pk_hex],...], "start":int}
  result: {"start":int, "mode":..., "proof":<proof_with_public_inputs>}
"""
from __future__ import annotations

import json
import time

from .signatures import (BATCH_K, check_approvals, get_ed25519_circuit,
                         fold_proof_tree, prove_signature_dev,
                         _dev_leaf_cache)

TASK_SUBJECT = "PROVE_SIGNATURE"
RESULT_SUBJECT = "PROCESS_SIGNATURE_RESULT"


def _leaf_data(msg_len: int, k: int, mode: str):
    """The leaf circuit a (mode, shape) pair proves — built deterministically
    on BOTH sides of the wire (the reference ships VerifierOnlyCircuitData
    bytes instead, signatures.rs:225-230; rebuilding from the same code is
    equivalent and stronger: the parent cannot be handed a forged circuit)."""
    if mode == "dev":
        # prime the dev-leaf cache for this message length
        if (msg_len,) not in _dev_leaf_cache:
            prove_signature_dev(b"\x00" * msg_len, b"\x00" * 64,
                                b"\x00" * 32)
        return _dev_leaf_cache[(msg_len,)][0]
    data, _ops, _tgs = get_ed25519_circuit(msg_len, k)
    return data


def handle_task(task_bytes: bytes) -> bytes:
    """Worker side: prove one leaf task, return result bytes.

    Plugs into transport.run_worker as the handler (the reference's
    sign-prover service loop)."""
    from ..plonk import serialization as SER
    from .signatures import prove_signature_batch
    t = json.loads(task_bytes)
    message = bytes.fromhex(t["message"])
    sig_pks = [(bytes.fromhex(s), bytes.fromhex(p))
               for s, p in t["sig_pks"]]
    if t["mode"] == "dev":
        data, proof = prove_signature_dev(message, *sig_pks[0])
    else:
        data, proof = prove_signature_batch(message, sig_pks)
    return json.dumps({
        "start": t["start"], "mode": t["mode"],
        "proof": SER.proof_to_json(proof, data.common),
    }).encode()


def run_signature_worker(host: str, port: int, max_messages=None,
                         poll_s: float = 0.05) -> int:
    """Worker process entry: pull PROVE_SIGNATURE tasks, prove, publish to
    PROCESS_SIGNATURE_RESULT (docker sign_prover replica equivalent,
    SURVEY.md §2.7)."""
    from ..service.transport import QueueClient, run_worker
    client = QueueClient(host, port)
    try:
        return run_worker(client, TASK_SUBJECT, RESULT_SUBJECT,
                          handle_task, poll_s=poll_s,
                          max_messages=max_messages)
    finally:
        client.close()


def prove_approvals_distributed(message: bytes, approvals: list,
                                validators: list, client,
                                dev_mode: bool = False,
                                timeout_s: float = 3600.0,
                                poll_s: float = 0.05):
    """signatures.rs:144 `prove_approvals_with_client`, broker-shaped.

    Publishes one task per BATCH_K leaf to TASK_SUBJECT, collects results
    from RESULT_SUBJECT (deduping redeliveries), verifies each returned
    proof, reorders to validator-index order and folds through the
    balanced recursion tree.  Returns (data, proof, ApprovalCheck) exactly
    like signatures.prove_approvals.
    """
    from ..plonk import serialization as SER, verifier
    check = check_approvals(message, approvals, validators)
    sig_pks = []
    for idx in check.valid_indices:
        sig = approvals[idx]
        raw_sig = sig[1:] if len(sig) == 65 else sig
        sig_pks.append((raw_sig, validators[idx].public_key[1:]))
    if not sig_pks:
        raise ValueError("no valid approvals to prove")

    mode = "dev" if dev_mode else "batch"
    step = 1 if dev_mode else BATCH_K
    starts = list(range(0, len(sig_pks), step))
    for start in starts:
        batch = sig_pks[start: start + step]
        client.publish(TASK_SUBJECT, json.dumps({
            "mode": mode, "message": message.hex(), "start": start,
            "sig_pks": [[s.hex(), p.hex()] for s, p in batch],
        }).encode())

    results: dict[int, object] = {}
    deadline = time.monotonic() + timeout_s
    while len(results) < len(starts):
        if time.monotonic() > deadline:
            missing = sorted(set(starts) - set(results))
            raise TimeoutError(
                f"distributed approvals: {len(missing)} leaf results "
                f"missing after {timeout_s}s (starts {missing[:5]}...)")
        msg = client.pull(RESULT_SUBJECT)
        if msg is None:
            time.sleep(poll_s)
            continue
        mid, payload = msg
        r = json.loads(payload)
        start = int(r["start"])
        if start not in results:              # dedupe redelivered results
            k = len(sig_pks[start: start + step])
            data = _leaf_data(len(message), k, r["mode"])
            proof = SER.unpack_gl_digests(SER.proof_from_json(r["proof"]))
            verifier.verify(proof, data.verifier_only, data.common)
            results[start] = (data, proof)
        client.ack(mid)

    leaves = [results[s] for s in starts]     # validator-index order
    data, proof = fold_proof_tree(leaves)
    return data, proof, check


def main(argv=None):  # pragma: no cover — CLI for real deployments
    """sign_prover replica entry point (docker-compose.yml sign_prover,
    Getting-started.md:129): pull PROVE_SIGNATURE tasks off the broker
    until terminated."""
    import argparse
    ap = argparse.ArgumentParser(description="zklc signature worker")
    ap.add_argument("--worker", required=True, metavar="HOST:PORT",
                    help="broker address")
    ap.add_argument("--max-messages", type=int, default=None)
    args = ap.parse_args(argv)
    host, port = args.worker.rsplit(":", 1)
    print(f"signature worker pulling from {host}:{port}", flush=True)
    run_signature_worker(host, int(port), max_messages=args.max_messages)


if __name__ == "__main__":  # pragma: no cover
    main()
