#!/bin/bash
# sf1 politeness-capped scaling pair (round 5, VERDICT r4 item 5):
# one 2/8 pair on the cached 960k-page corpus with a REAL per-host
# budget in the measured path. Cap 32768 ≈ the sf0.1 leg's 4096
# scaled by the corpus head-host growth (14,098 → 105,856 pages), so
# the Zipf-head host drains over the same ~3-4 politeness windows at
# 10× data. Each leg waits for a clean window first (bench bracket
# probe vs BENCH/clean_rate.json) and carries its own in-attempt
# window audit in the output JSON.
cd /root/repo
OUT=BENCH/sf1_capped_r5.jsonl
: > $OUT
wait_clean() {
  python3 - <<'EOF'
import json, time
import bench
try:
    ref = 0.95 * json.load(open("BENCH/clean_rate.json"))["mspins"]
except Exception:
    ref = 0.0
deadline = time.time() + 900
while time.time() < deadline:
    r = bench._bracket_rate()
    if r is None or ref == 0 or r >= 0.85 * ref:
        print(f"window ok: {r}")
        break
    print(f"waiting: {r} < {0.85*ref:.1f}")
    time.sleep(45)
EOF
}
for master in 'local[2]' 'local[8]'; do
  wait_clean
  LINE=$(env SPARK_GRAFT_BENCH_PAGES=960000 timeout 3000 python bench.py \
    --crawl-only --master "$master" --pages 960000 --host-budget 32768 \
    2>/dev/null | tail -1)
  echo "{\"master\": \"$master\", \"host_budget\": 32768, \"res\": $LINE}" >> $OUT
done
echo '{"done": true}' >> $OUT
