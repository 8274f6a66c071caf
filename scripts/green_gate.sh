#!/usr/bin/env bash
# Green gate: refuse to snapshot unless the FULL test suite ran and passed.
# Catches both ordinary failures (exit != 0) and ScalaTest suite ABORTS
# (which skip every test in the suite while still printing a summary).
# Usage: scripts/green_gate.sh   (run from repo root; exits 0 only on green)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p target
LOG=target/green_gate_test.log
sbt -batch test 2>&1 | tee "$LOG"
code=${PIPESTATUS[0]}
if [ "$code" -ne 0 ]; then
  echo "GREEN_GATE: sbt test exit $code — RED, do not snapshot" >&2
  exit 1
fi
if [ ! -s "$LOG" ]; then
  echo "GREEN_GATE: test log missing/empty — RED, do not snapshot" >&2
  exit 1
fi
if grep -q "ABORTED" "$LOG"; then
  echo "GREEN_GATE: suite ABORTED detected — RED, do not snapshot" >&2
  exit 1
fi
echo "GREEN_GATE: full suite green"
