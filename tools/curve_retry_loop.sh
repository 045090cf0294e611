#!/bin/bash
# Gated retry for a FULL five-point flagship curve in one healthy
# window (r08 protocol note: one flat window beats mixing best-of
# rows). Usage: curve_retry_loop.sh <flagship> <out.json> [max_attempts]
# Healthy-start attempts only; stops on the first sweep whose points
# ALL bracket clean, or after max_attempts (default 3) healthy starts.
cd /root/repo || exit 1
FLAGSHIP="${1:?flagship}"
OUT="${2:?out.json}"
MAX="${3:-3}"
tries=0
while [ "$tries" -lt "$MAX" ]; do
  grade=$(python tools/host_sentinel.py 2>/dev/null | python -c 'import json,sys; print(json.load(sys.stdin).get("grade",""))')
  echo "$(date -u +%H:%M:%S) sentinel: $grade (healthy attempts: $tries)"
  if [ "$grade" = "healthy" ]; then
    tries=$((tries + 1))
    SCALE_FLAGSHIPS="$FLAGSHIP" python tools/scale_bench.py 3 \
      >"$OUT.attempt$tries" 2>"$OUT.attempt$tries.log"
    rc=$?
    if [ "$rc" -eq 2 ]; then
      tries=$((tries - 1))
      echo "$(date -u +%H:%M:%S) start gate refused (window moved); not counted"
    elif [ "$rc" -eq 0 ]; then
      verdict=$(python - "$OUT.attempt$tries" "$FLAGSHIP" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
b = d["scaling"][sys.argv[2]]["brackets"]
bad = [k for k, v in b.items() if v["contaminated"]]
print("clean" if not bad else "contaminated:" + ",".join(bad))
EOF
)
      echo "$(date -u +%H:%M:%S) attempt $tries: $verdict"
      if [ "$verdict" = "clean" ]; then
        cp "$OUT.attempt$tries" "$OUT"
        echo "CURVE-READY: $OUT"
        exit 0
      fi
    else
      echo "$(date -u +%H:%M:%S) attempt $tries: child failed rc=$rc"
    fi
  fi
  sleep 150
done
echo "EXHAUSTED: $MAX healthy-start attempts without an all-clean sweep"
exit 3
