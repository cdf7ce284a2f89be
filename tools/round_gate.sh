#!/usr/bin/env bash
# Round-close protocol gate: refuse the end-of-round snapshot when the
# checked-in test evidence is stale or red.
#
#   tools/round_gate.sh            # exit 0 = safe to snapshot
#
# Checks:
#   1. every suite report under target/test-reports/ has
#      failures="0" errors="0"
#   2. the NEWEST source file (src/, tools/, build.sbt) is not newer
#      than the OLDEST suite report — i.e. the full suite ran on the
#      code being snapshotted, not on an earlier tree
#
# Rationale (round-10 post-mortem): the last hour of r10 landed code
# after the final test run and closed 358/359 — this gate makes that
# shape a refusal instead of a verdict finding.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REPORTS="$REPO/target/test-reports"
fail() { echo "ROUND GATE: REFUSED — $1" >&2; exit 1; }

[ -d "$REPORTS" ] || fail "no test reports at $REPORTS (run: sbt test)"
reports=("$REPORTS"/TEST-*.xml)
[ -e "${reports[0]}" ] || fail "no suite XMLs in $REPORTS (run: sbt test)"

# 1. all green
for r in "${reports[@]}"; do
  head=$(grep -oE '<testsuite[^>]*' "$r" | head -1)
  case "$head" in
    *'failures="0"'*) : ;;
    *) fail "$(basename "$r") is not green (failures != 0)" ;;
  esac
  case "$head" in
    *'errors="0"'*) : ;;
    *) fail "$(basename "$r") is not green (errors != 0)" ;;
  esac
done

# 2. reports fresher than every source file
newest_src=$(find "$REPO/src" "$REPO/tools" "$REPO/build.sbt" -type f \
  -newer "$(ls -t "${reports[@]}" | tail -1)" 2>/dev/null | head -5)
if [ -n "$newest_src" ]; then
  echo "ROUND GATE: REFUSED — source newer than the oldest suite report:" >&2
  echo "$newest_src" >&2
  echo "re-run the FULL suite (sbt test) on the current tree first" >&2
  exit 1
fi

n=$(ls "${reports[@]}" | wc -l)
echo "ROUND GATE: OK — $n suites green, reports fresher than every source file"
