#!/usr/bin/env bash
# Round-open checklist step 1: commit the driver's per-round artifacts
# (BENCH.json refresh, BENCH_r{N}.json, CORRECTNESS_r{N}.json, VERDICT.md,
# ADVICE.md) as the round's FIRST commit, so `git status` is clean at judge
# time and the artifact history lives in git rather than the working tree.
#
# Usage: scripts/open_round.sh <round-number>
# Idempotent: exits 0 with no commit if there is nothing to add.
set -euo pipefail

round="${1:?usage: scripts/open_round.sh <round-number>}"
cd "$(git rev-parse --show-toplevel)"

git add -A -- \
    BENCH.json 'BENCH_r*.json' 'CORRECTNESS_r*.json' 'PARITY_r*.txt' \
    VERDICT.md ADVICE.md 2>/dev/null || true

if git diff --cached --quiet; then
    echo "open_round: artifacts already committed, nothing to do"
    exit 0
fi

git commit -m "round ${round}: commit driver artifacts (bench/correctness/verdict/advice)"
echo "open_round: committed round ${round} artifacts"
