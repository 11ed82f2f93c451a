#!/bin/bash
# Slow-lane evidence, mechanically (VERDICT r04 "What's missing" #3):
# runs the @slow suite, tees to TESTS_SLOW_r${ROUND}.log, and FAILS LOUDLY
# (nonzero exit, log removed) if the log somehow ends up empty — an empty
# log can never again masquerade as a pass.
#
# Usage:  ROUND=05 scripts/run_slow_lane.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
ROUND="${ROUND:-05}"
LOG="TESTS_SLOW_r${ROUND}.log"

echo "=== slow lane $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD) ===" | tee "$LOG"
python -m pytest tests/ -m slow -q -p no:cacheprovider --durations=20 "$@" 2>&1 | tee -a "$LOG"
rc=${PIPESTATUS[1]}

if [ ! -s "$LOG" ] || [ "$(wc -l < "$LOG")" -lt 3 ]; then
    echo "FATAL: slow-lane log is empty/truncated — refusing to leave a fake artifact" >&2
    rm -f "$LOG"
    exit 1
fi
echo "=== exit $rc $(date -u +%FT%TZ) ===" | tee -a "$LOG"
exit "$rc"
