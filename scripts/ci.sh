#!/usr/bin/env bash
# Full-suite CI: the whole test battery INCLUDING the slow e2e trainer
# modules (pytest -m slow covers the multi-minute launcher runs that the
# fast `-m "not slow"` iteration loop skips). Run at least once per round;
# the result is appended to PROGRESS.jsonl so the round record shows a
# full-suite-green (or not) line. ~30-40 min serial on this one-core host
# (pytest-xdist is a measured net loss here — keep it serial).
#
# Usage:  bash scripts/ci.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/ci_full.log
start=$(date +%s)
python -m pytest tests/ -q --durations=15 "$@" 2>&1 | tee "$LOG"
status=${PIPESTATUS[0]}
end=$(date +%s)
summary=$(grep -E "[0-9]+ (passed|failed)" "$LOG" | tail -1)
STATUS="$status" SECONDS_TAKEN="$((end - start))" SUMMARY="$summary" \
python - <<'EOF'
import json, os, time

rec = {
    "event": "ci_full_suite",
    "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    "exit_status": int(os.environ["STATUS"]),
    "seconds": int(os.environ["SECONDS_TAKEN"]),
    "summary": os.environ["SUMMARY"].strip(),
}
with open("PROGRESS.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
print("recorded:", rec)
EOF
exit "$status"
