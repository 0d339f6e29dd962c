#!/bin/bash
# Crash-resilient driver for the real-prover BFT pipeline: every stage
# checkpoint persists, so each retry resumes where the last attempt died
# (tunnel wedge, HBM exhaustion, OOM-kill).  Fresh process per attempt =
# fresh HBM.
#
# Env knobs: ZKLC_BFT_MODE (random|epoch), ZKLC_BFT_ATTEMPTS,
# ZKLC_BFT_ATTEMPT_S, ZKLC_BFT_LOG (defaults to proofs/real_bft_<mode>.log)
cd "$(dirname "$0")/.."
MODE="${ZKLC_BFT_MODE:-random}"
LOG="${ZKLC_BFT_LOG:-proofs/real_bft_${MODE}.log}"
for i in $(seq 1 "${ZKLC_BFT_ATTEMPTS:-12}"); do
  echo "=== real_bft_prove mode=$MODE attempt $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout "${ZKLC_BFT_ATTEMPT_S:-5400}" \
    python scripts/real_bft_prove.py --mode "$MODE" --out proofs \
    >> "$LOG" 2>&1
  rc=$?
  echo "=== attempt $i rc=$rc ===" >> "$LOG"
  [ $rc -eq 0 ] && exit 0
  sleep 20
done
exit 1
