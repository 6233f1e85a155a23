#!/bin/bash
cd /root/repo
OUT=BENCH/sf1_waves_r4.jsonl
: > $OUT
for cfg in auto_waves fix64; do
  case $cfg in
    auto_waves) ENVV="SPARK_GRAFT_BENCH_AUTO_SHUFFLE=1" ;;
    fix64)      ENVV="SPARK_GRAFT_BENCH_AUTO_SHUFFLE=0 SPARK_GRAFT_BENCH_SHUFFLE=64" ;;
  esac
  LINE=$(env $ENVV SPARK_GRAFT_BENCH_PAGES=960000 timeout 1800 python bench.py --crawl-only --master 'local[8]' --pages 960000 2>/dev/null | tail -1)
  echo "{\"cfg\": \"$cfg\", \"res\": $LINE}" >> $OUT
done
echo DONE >> $OUT
