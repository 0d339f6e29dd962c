#!/bin/bash
# Crash-resilient driver for the real-prover BFT pipeline: every stage
# checkpoint persists, so each retry resumes where the last attempt died
# (tunnel wedge, HBM exhaustion, OOM-kill).  Fresh process per attempt =
# fresh HBM.
cd "$(dirname "$0")/.."
for i in $(seq 1 "${ZKLC_BFT_ATTEMPTS:-12}"); do
  echo "=== real_bft_prove attempt $i $(date -u +%H:%M:%S) ===" >> proofs/real_bft_r04.log
  timeout "${ZKLC_BFT_ATTEMPT_S:-5400}" \
    python scripts/real_bft_prove.py --mode random --out proofs \
    >> proofs/real_bft_r04.log 2>&1
  rc=$?
  echo "=== attempt $i rc=$rc ===" >> proofs/real_bft_r04.log
  [ $rc -eq 0 ] && exit 0
  sleep 20
done
exit 1
