#!/bin/bash
# Poll the host's memory-stream ceiling and run the bench scaling phase on
# the first quiet window (stream efficiency >= threshold). Evidence-run
# helper for BENCH.md; see the probe-bracket policy there.
THRESH=${1:-0.55}
TRIES=${2:-12}
for i in $(seq 1 "$TRIES"); do
  S=$(python - <<'EOF' 2>/dev/null
import bench
print(bench.machine_ceiling([4, 16])["stream_ceiling_efficiency"])
EOF
)
  echo "probe $i: stream ceiling $S" >&2
  ok=$(python -c "print(1 if float('$S' or 0) >= float('$THRESH') else 0)")
  if [ "$ok" = "1" ]; then
    BENCH_ONLY_SCALING=1 python bench.py
    exit $?
  fi
  sleep 240
done
echo '{"metric": "scaling-only rerun", "value": null, "note": "no quiet window found"}'
