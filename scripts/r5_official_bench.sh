#!/bin/bash
# Round-5 official bench orchestrator: wait (bounded) for a clean
# window, run the full official sf0.1 bench (the exact per-round
# driver invocation: default env + the persistent clean-rate seed),
# then — only if the host is clean — rerun the sf1 politeness-capped
# pair to replace the contended first datapoint.
cd /root/repo
LOCK=/tmp/spark_bench_lock
wait_clean() {  # $1 = deadline seconds
  python3 - "$1" <<'EOF'
import json, sys, time
import bench
try:
    ref = 0.95 * json.load(open("BENCH/clean_rate.json"))["mspins"]
except Exception:
    ref = 0.0
deadline = time.time() + float(sys.argv[1])
while time.time() < deadline:
    r = bench._bracket_rate()
    if r is None or ref == 0 or r >= 0.85 * ref:
        print(f"CLEAN {r}")
        sys.exit(0)
    print(f"dirty {r:.1f} < {0.85*ref:.1f}", flush=True)
    time.sleep(60)
print("TIMEOUT")
sys.exit(1)
EOF
}

wait_clean 4500; CLEAN1=$?
touch $LOCK
timeout 4200 python bench.py > /tmp/bench_r5_official.out 2>/tmp/bench_r5_official.err
tail -1 /tmp/bench_r5_official.out | grep '^{' > BENCH/bench_r5_official_2_8.json
cp BENCH/last_run_full.json BENCH/bench_r5_official_full.json
rm -f $LOCK
echo "official done (clean_at_start=$CLEAN1)"

if wait_clean 1800; then
  touch $LOCK
  cp BENCH/sf1_capped_r5.jsonl BENCH/sf1_capped_r5_contended.jsonl
  bash scripts/sf1_capped_r5.sh > /tmp/sf1_capped_rerun.log 2>&1
  rm -f $LOCK
  echo "sf1 rerun done"
else
  echo "sf1 rerun skipped: no clean window"
fi
