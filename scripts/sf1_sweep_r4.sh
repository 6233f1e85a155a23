#!/bin/bash
# sf1 shuffle-sizing sweep (round 4): auto-128 (HEAD default, quantized)
# vs auto-64 vs hand-tuned fix64 vs auto-128+AQE, interleaved 2 reps at
# local[8] on the cached 960k-page corpus.
cd /root/repo
OUT=BENCH/sf1_ab_r4.jsonl
: > $OUT
for rep in 1 2; do
  for cfg in auto128 auto64 fix64 auto128_aqe; do
    case $cfg in
      auto128)     ENVV="SPARK_GRAFT_BENCH_AUTO_SHUFFLE=1" ;;
      auto64)      ENVV="SPARK_GRAFT_BENCH_AUTO_SHUFFLE=1 SPARK_GRAFT_BENCH_TARGET_PB=$((64<<20))" ;;
      fix64)       ENVV="SPARK_GRAFT_BENCH_AUTO_SHUFFLE=0 SPARK_GRAFT_BENCH_SHUFFLE=64" ;;
      auto128_aqe) ENVV="SPARK_GRAFT_BENCH_AUTO_SHUFFLE=1 SPARK_GRAFT_BENCH_AQE=1" ;;
    esac
    LINE=$(env $ENVV SPARK_GRAFT_BENCH_PAGES=960000 timeout 1800 python bench.py --crawl-only --master 'local[8]' --pages 960000 2>/dev/null | tail -1)
    echo "{\"cfg\": \"$cfg\", \"rep\": $rep, \"res\": $LINE}" >> $OUT
  done
done
echo DONE >> $OUT
