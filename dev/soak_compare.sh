#!/bin/bash
# sf1 soak oracle sweep: every oracle under a per-query timeout
# (SOAK.md "Reproduce"). Usage: dev/soak_compare.sh <sfDir> <verifyOut>
SF=${1:-/tmp/sf1}
OUT=${2:-/tmp/v_sf1}
for q in $(python3 -c "import json;print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))"); do
  timeout 600 python3 dev/compare_driver.py "$SF" "$OUT" "$q" 2>&1 \
    | grep -E "^(PASS|FAIL)" || echo "TIMEOUT-or-ERR $q"
done
