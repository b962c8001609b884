#!/bin/bash
# Full-surface differential at a given sf_dir, split into fresh-JVM
# chunks so per-session state (UI history, py4j registry, checkpoint
# blocks) never accumulates across 200+ heavy queries. Usage:
#   ./tools_verify_chunked.sh /tmp/dlw_sfx1 out.log [chunk_size]
set -u
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-verify_chunked.log}"
CHUNK="${3:-40}"
: > "$OUT"
NAMES=$(python3 -c "
import sys; sys.path.insert(0,'/root/repo')
import __spark_entry__ as E
print('\n'.join(E.queries()))")
echo "$NAMES" | xargs -n "$CHUNK" | while read -r batch; do
  only=$(echo "$batch" | tr ' ' ',')
  SPARK_GRAFT_DRIVER_MEM=48g python tools_verify_driver.py --only "$only" "$SF" >> "$OUT" 2>&1
done
grep -c "OK\|rows-only" "$OUT"
grep "HASH-MISMATCH\|ERR " "$OUT" | head -20
