#!/bin/bash
# Round-6: post-fix sf1 (960k pages) politeness-capped 2/8 pair
# (VERDICT r5 #3) — same legs as BENCH/sf1_capped_r5.jsonl (cap 32768)
# through the frozen bench's --crawl-only path. Appends raw leg JSON.
cd /root/repo
OUT=${SPARK_GRAFT_SF1_OUT:-BENCH/r6/sf1_capped_r6.jsonl}
# exported (not just --pages) so the engine's volume-scaled GC
# nursery sees the corpus size at session creation (session.py)
export SPARK_GRAFT_BENCH_PAGES=960000
for m in 'local[2]' 'local[8]'; do
  echo "== $m $(date -u +%H:%M:%S)" >&2
  python bench.py --crawl-only --master "$m" \
    --host-budget 32768 2>/dev/null | tail -1 >> "$OUT"
done
python - <<EOF
import json
rows = [json.loads(l) for l in open('$OUT') if l.startswith('{')]
legs = {r['master']: r for r in rows}
a = legs['local[2]']['sustained_pages_per_sec']
b = legs['local[8]']['sustained_pages_per_sec']
print(json.dumps({'eff_sustained': round(b / (4 * a), 3),
                  'lo_wall': legs['local[2]']['wall_sec'],
                  'hi_wall': legs['local[8]']['wall_sec']}))
EOF
