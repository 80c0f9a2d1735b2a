#!/usr/bin/env bash
# Full-suite runner: one pytest process PER TEST FILE, sequentially.
#
# Why not one `pytest tests/`: a single-process run over all ~150 tests
# occasionally segfaults inside an XLA:CPU compile (observed at
# test_rect_molding.py::test_rect_model_detects_end_to_end after 100+
# green tests; the file passes in isolation) — an upstream XLA CPU
# compiler crash under accumulated in-process state, not a test bug.
# Per-file processes bound the accumulated state, keep every file's
# pass/fail independent, and still make "the whole suite green" one
# command: ./tests/run_all.sh
#
# The dev box has ONE host CPU core (CLAUDE.md) — files run sequentially;
# parallel shards would cross-contaminate and slow everything down.
set -u
cd "$(dirname "$0")/.."

fail=0
failed_files=()
total_passed=0
start=$(date +%s)
for f in tests/test_*.py; do
  out=$(python -m pytest "$f" -q --no-header -p no:cacheprovider 2>&1)
  rc=$?
  tail_line=$(printf '%s\n' "$out" | grep -E "passed|failed|error" | tail -1)
  printf '%-36s %s\n' "$(basename "$f")" "${tail_line:-rc=$rc (no summary)}"
  n=$(printf '%s\n' "$tail_line" | grep -oE '[0-9]+ passed' | grep -oE '[0-9]+' || true)
  total_passed=$((total_passed + ${n:-0}))
  if [ $rc -ne 0 ]; then
    fail=1
    failed_files+=("$f")
    printf '%s\n' "$out" | tail -40
  fi
done
echo "----"
echo "total: $total_passed passed, $((($(date +%s) - start))) s"
if [ $fail -ne 0 ]; then
  echo "FAILED files: ${failed_files[*]}"
  exit 1
fi
echo "ALL GREEN"
