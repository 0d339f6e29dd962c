"""Proof-pipeline orchestrator: the backend service layer (L6) equivalent.

Re-expresses backend/src/* (SURVEY.md §2.6) without external services:
  * status store: JSON file keyed by block hash with the reference's
    state machine IN-PROCESSING / DONE / ERROR (prisma BlockProof analogue,
    nats-processor.ts:44-80);
  * generate_proof / get_proof_status: controllers/proof.controller.ts:8,50;
  * epoch processor loop: epoch/epoch-processor.ts:7-31 (poll checkpoint ->
    prove next epoch) with the 5 s retry discipline;
  * artifact persistence under proofs/{epoch,random}/<hash>/ —
    bin/prove_block.rs:302-458 checkpoint/resume layout.

The Ethereum submission and NEAR RPC edges are pluggable callables (this
environment has no egress); their call signatures mirror eth-helper.ts:451
`executeProofSaving` and near-helper.ts fetchers.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


class ProofStatus:
    IN_PROCESSING = "IN-PROCESSING"
    DONE = "DONE"
    ERROR = "ERROR"


@dataclass
class StatusStore:
    """File-backed BlockProof table (prisma/schema.prisma analogue).

    All read-modify-write cycles run under a per-store lock so concurrent
    worker threads (the HTTP API proves different blocks in parallel) can't
    rewrite the table from a stale snapshot (ADVICE r2)."""
    path: str

    def __post_init__(self):
        import threading
        self._lock = threading.Lock()

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {}

    def _save(self, d: dict):
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(d, f, indent=1)
        os.replace(tmp, self.path)

    def get(self, block_hash: str) -> dict | None:
        with self._lock:
            return self._load().get(block_hash)

    def set(self, block_hash: str, **fields):
        with self._lock:
            d = self._load()
            row = d.setdefault(block_hash, {"dateCreate": time.time()})
            row.update(fields)
            self._save(d)

    def claim(self, block_hash: str, **fields) -> tuple[bool, dict]:
        """Atomically mark IN-PROCESSING unless already DONE/IN-PROCESSING.

        Returns (claimed, row). Closes the dedupe TOCTOU between the status
        check and the worker spawn (ADVICE r2, http_api.py)."""
        with self._lock:
            d = self._load()
            row = d.get(block_hash)
            if row and row.get("status") in (ProofStatus.DONE,
                                             ProofStatus.IN_PROCESSING):
                return False, row
            row = d.setdefault(block_hash, {"dateCreate": time.time()})
            row.update(fields)
            row["status"] = ProofStatus.IN_PROCESSING
            self._save(d)
            return True, row


@dataclass
class Orchestrator:
    proofs_dir: str = "proofs"
    store: StatusStore = None
    submit_fn: object = None        # executeProofSaving equivalent
    dev_mode: bool = False
    # broker address ("host:port") enabling distributed signature fan-out
    # (near/distributed.py; the docker sign_prover replicas of SURVEY
    # §2.7); also read from ZKLC_SIG_BROKER env
    sig_broker: str = None
    # "plonk" (the circuit pipeline) or "statement" (the second
    # implementation as a receipt-producing dev backend — the risc0
    # proving-server alternative, near_risc0/host/src/service.rs:60-86)
    backend: str = "plonk"

    def __post_init__(self):
        if self.store is None:
            self.store = StatusStore(os.path.join(self.proofs_dir,
                                                  "status.json"))

    # -- proof.controller.ts:8 generateProof -------------------------------
    def generate_proof(self, epoch_blocks, blocks, validators,
                       mode: str = "random", validators_n_1=None,
                       wrap: bool | None = None,
                       claimed: bool = False) -> dict:
        """Prove + (optionally) BN128-wrap + write artifacts.

        wrap=None defaults to the real-prover path (prove_block.rs:279-300
        wraps every final proof); dev_mode skips the wrap by default.
        Epoch mode writes artifacts for BOTH target blocks (Block_0(E_i)
        and Block_n-1(E_i-1)) and returns the Block_0 row."""
        from ..near import bft
        from ..near.types import b58encode
        from ..plonk.serialization import write_proof_artifacts
        if wrap is None:
            wrap = not self.dev_mode
        block_hash = b58encode(blocks[4].hash)
        if claimed:
            # caller already holds the IN-PROCESSING claim (http_api)
            self.store.set(block_hash, height=blocks[4].height)
        else:
            ok, row = self.store.claim(block_hash, height=blocks[4].height)
            if not ok:
                return row                        # dedupe DONE + in-flight
        try:
            if self.backend == "statement":
                return self._generate_statement_proof(
                    block_hash, epoch_blocks, blocks, validators,
                    mode, validators_n_1)
            sig_client = None
            broker = self.sig_broker or os.environ.get("ZKLC_SIG_BROKER")
            if broker:
                from .transport import QueueClient
                host, port = broker.rsplit(":", 1)
                sig_client = QueueClient(host, int(port))
            try:
                res = bft.prove_block_bft(epoch_blocks, blocks, validators,
                                          dev_mode=self.dev_mode, mode=mode,
                                          validators_n_1=validators_n_1,
                                          sig_client=sig_client)
            finally:
                if sig_client is not None:
                    sig_client.close()
            results = list(res) if isinstance(res, tuple) else [res]
            targets = [blocks[4]] + ([blocks[5]] if len(results) > 1 else [])
            out_dirs = []
            for tgt, r in zip(targets, results):
                data, proof = r.data, r.proof
                if wrap:
                    from ..wrap.wrap import wrap_proof
                    data, proof = wrap_proof(data, proof)
                d = os.path.join(self.proofs_dir, mode, b58encode(tgt.hash))
                write_proof_artifacts(d, proof, data, tgt.hash)
                out_dirs.append(d)
            if self.submit_fn is not None:
                self.submit_fn(results[0].public_inputs, out_dirs[0])
            self.store.set(block_hash, status=ProofStatus.DONE,
                           artifacts=out_dirs[0],
                           artifacts_n_1=out_dirs[1] if len(out_dirs) > 1
                           else None)
        except Exception as e:
            self.store.set(block_hash, status=ProofStatus.ERROR,
                           error=str(e)[:500])
            raise
        return self.store.get(block_hash)

    def _generate_statement_proof(self, block_hash, epoch_blocks, blocks,
                                  validators, mode, validators_n_1):
        """Route a proving task through the second implementation: the
        native statement executor emits a dev-mode receipt (journal +
        fake seal) that flows through the same status store / artifact /
        submit path as a circuit proof — the RISC0_DEV_MODE proving-server
        alternative (near_risc0/host/src/service.rs:60-86,
        host/tests/tests.rs:16-17)."""
        from ..near import statement_prover as SP
        if mode == "epoch":
            row = SP.generate_epoch_proof(epoch_blocks, blocks, validators,
                                          validators_n_1)
        else:
            row = SP.generate_random_proof(epoch_blocks, blocks, validators)
        d = os.path.join(self.proofs_dir, mode, block_hash)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "receipt.json"), "w") as f:
            json.dump(row, f, indent=1)
        if self.submit_fn is not None:
            self.submit_fn(row["journal"], d)
        self.store.set(block_hash, status=ProofStatus.DONE,
                       artifacts=d, backend="statement")
        return self.store.get(block_hash)

    # -- proof.controller.ts:50 getProofStatus ------------------------------
    def get_proof_status(self, block_hash: str) -> dict:
        row = self.store.get(block_hash)
        return row or {"status": "NOT-FOUND"}

    # -- epoch-processor.ts:7 polling loop ----------------------------------
    def epoch_processor(self, get_checkpoint_fn, next_epoch_task_fn,
                        iterations: int = 1, retry_s: float = 5.0):
        """Poll the on-chain checkpoint, prove the next epoch; retry on
        failure every retry_s (epoch-processor.ts:29-32)."""
        for _ in range(iterations):
            try:
                checkpoint = get_checkpoint_fn()
                task = next_epoch_task_fn(checkpoint)
                if task is None:
                    return
                epoch_blocks, blocks, validators = task
                self.generate_proof(epoch_blocks, blocks, validators,
                                    mode="epoch")
            except Exception:
                time.sleep(retry_s)
