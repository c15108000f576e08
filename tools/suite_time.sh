#!/usr/bin/env bash
# Reproducible suite-timing protocol (round-13 verdict task 3).
#
# The README's wall-time claim must come from THIS script, not from an ad-hoc
# quiet-box run: it records the box load alongside the measurement so a
# reader can tell a contended run from an idle one (rounds 11/12: the same
# green suite measured 6-15 min depending on what else the box was doing).
#
# Usage: tools/suite_time.sh [outFile]   (default SUITE_TIME.txt, repo root)
# Protocol: one bare `sbt test` from a cold sbt server, wall-clocked with
# /usr/bin/time, load average + CPU count snapshotted before and after.
set -u
cd "$(dirname "$0")/.."
out="${1:-SUITE_TIME.txt}"

{
  echo "== suite_time.sh $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "git HEAD: $(git rev-parse --short HEAD) ($(git status --porcelain | wc -l) dirty files)"
  echo "cpus: $(nproc); loadavg before: $(cut -d' ' -f1-3 /proc/loadavg)"
} | tee "$out"

start=$(date +%s)
sbt -batch test > /tmp/suite_time_sbt.log 2>&1
rc=$?
end=$(date +%s)

{
  echo "loadavg after: $(cut -d' ' -f1-3 /proc/loadavg)"
  echo "exit code: $rc"
  echo "wall seconds: $((end - start))"
  grep -E "^\[info\] (Tests:|Total number of tests run|All tests passed|Suites:)" \
    /tmp/suite_time_sbt.log | sort | uniq -c | sed 's/^ *//'
  # per-group totals (one line per forked group's final summary)
  grep -E "^\[info\] Run completed in" /tmp/suite_time_sbt.log | sed 's/^ *//'
} | tee -a "$out"

echo "full log: /tmp/suite_time_sbt.log"
exit $rc
