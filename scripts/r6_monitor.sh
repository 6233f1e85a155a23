#!/bin/bash
# Phase monitor for a bench.py run: logs timestamp, load, and the
# interesting child processes every 15s so the phase timeline of a
# full bench run can be reconstructed afterwards.
OUT="$1"
while true; do
  {
    echo "=== $(date +%s) $(date -u +%H:%M:%S) load=$(cut -d' ' -f1-3 /proc/loadavg)"
    ps -eo pid,etimes,pcpu,rss,args | grep -E "bench\.py|java|python.*-c" | grep -v grep | cut -c1-160
  } >> "$OUT"
  sleep 15
done
