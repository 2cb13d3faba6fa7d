#!/bin/bash
# Poll the host's memory-stream ceiling and run the bench scaling phase on
# the first quiet window (stream efficiency >= threshold). Evidence-run
# helper for BENCH.md; see the probe-bracket policy there. Probes the SAME
# levels the scaling phase will run (BENCH_LEVELS, default 4,16).
cd "$(dirname "$0")/.." || exit 1
THRESH=${1:-0.55}
TRIES=${2:-12}
LEVELS=${BENCH_LEVELS:-4,16}
for i in $(seq 1 "$TRIES"); do
  S=$(BENCH_LEVELS="$LEVELS" python - <<'PYEOF'
import os
import bench
levels = [int(x) for x in os.environ["BENCH_LEVELS"].split(",")]
print(bench.machine_ceiling(levels)["stream_ceiling_efficiency"])
PYEOF
)
  echo "probe $i: stream ceiling ${S:-probe-failed}" >&2
  if [ -z "$S" ]; then sleep 240; continue; fi
  ok=$(python -c "print(1 if float('$S') >= float('$THRESH') else 0)")
  if [ "$ok" = "1" ]; then
    BENCH_ONLY_SCALING=1 BENCH_LEVELS="$LEVELS" python bench.py
    exit $?
  fi
  sleep 240
done
echo '{"metric": "scaling-only rerun", "value": null, "note": "no quiet window found"}'
