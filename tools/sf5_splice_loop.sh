#!/bin/bash
# r09 sf5 splice retry loop (VERDICT r08 item 3): every ~150 s, grade
# the host window; when healthy, run the gated single-point profiler
# measurement (SCALE_POINTS=sf5, min-of-3, per-point brackets). Stop
# on the first healthy-start attempt whose bracket is CLEAN, or after
# 3 healthy-start attempts whose brackets never agree (the protocol's
# "pin the probe row as permanent record" exit). Degraded/marginal
# starts don't count as attempts — the enforced start gate refuses
# them (rc=2) before any measurement.
cd /root/repo || exit 1
tries=0
while [ "$tries" -lt 3 ]; do
  grade=$(python tools/host_sentinel.py 2>/dev/null | python -c 'import json,sys; print(json.load(sys.stdin).get("grade",""))')
  echo "$(date -u +%H:%M:%S) sentinel: $grade (healthy attempts so far: $tries)"
  if [ "$grade" = "healthy" ]; then
    tries=$((tries + 1))
    out="/tmp/sf5_splice_attempt_${tries}.json"
    SCALE_FLAGSHIPS=profiler_e2e SCALE_POINTS=sf5 \
      python tools/scale_bench.py 3 >"$out" 2>"/tmp/sf5_splice_attempt_${tries}.log"
    rc=$?
    if [ "$rc" -eq 2 ]; then
      # window degraded between the probe and the start gate: not an attempt
      tries=$((tries - 1))
      echo "$(date -u +%H:%M:%S) start gate refused (window moved); not counted"
    elif [ "$rc" -eq 0 ]; then
      clean=$(python - "$out" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
b = d["scaling"]["profiler_e2e"]["brackets"]["sf5"]
print("clean" if not b["contaminated"] else "contaminated")
EOF
)
      echo "$(date -u +%H:%M:%S) attempt $tries: $clean -> $out"
      if [ "$clean" = "clean" ]; then
        echo "SPLICE-READY: $out"
        exit 0
      fi
    else
      echo "$(date -u +%H:%M:%S) attempt $tries: child failed rc=$rc"
    fi
  fi
  sleep 150
done
echo "EXHAUSTED: 3 healthy-start attempts, none bracketed clean — pin the probe row"
exit 3
