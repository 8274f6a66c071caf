#!/usr/bin/env bash
# Sample executor-thread stacks of the (single) running Bench43 JVM.
# Usage: jstack_sample.sh [samples] [interval_s]  — prints the top
# collapsed frames across samples (poor-man's flame profile).
set -uo pipefail
N=${1:-20}; IV=${2:-0.3}
PID=$(jps -l | grep graft.Bench43 | awk '{print $1}' | head -1)
[ -z "$PID" ] && { echo "no Bench43 JVM found" >&2; exit 1; }
TMP=$(mktemp -d)
for i in $(seq 1 "$N"); do jstack "$PID" > "$TMP/s$i.txt" 2>/dev/null; sleep "$IV"; done
# keep only RUNNABLE executor task threads; collapse to top-8 frames
python3 - "$TMP" <<'PY'
import sys, os, re, collections
d = sys.argv[1]
ctr = collections.Counter()
for f in os.listdir(d):
    txt = open(os.path.join(d, f), errors="replace").read()
    for block in txt.split("\n\n"):
        if "Executor task launch worker" not in block: continue
        if "RUNNABLE" not in block: continue
        frames = re.findall(r"at ([\w.$/<>]+)\(", block)
        if not frames: continue
        # drop ubiquitous leaf noise, keep the informative prefix
        ctr["\n    ".join(frames[:8])] += 1
total = sum(ctr.values())
print(f"samples of RUNNABLE executor threads: {total}")
for stack, n in ctr.most_common(12):
    print(f"\n== {n} ({100*n/total:.0f}%) ==\n    {stack}")
PY
rm -rf "$TMP"
