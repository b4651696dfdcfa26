#!/usr/bin/env bash
# Round-end gate: never finish a round without executing the hard signal.
# Rounds 4–5 shipped a broken engine twice because snapshots were committed
# mid-refactor with zero query executions. This script is the precondition
# for ending a round: it runs the engine test file and a set of oracle
# spot-checks (Spark vs DuckDB at sf0.001) and exits non-zero on any red.
#
# Usage: bash scripts/round_gate.sh  [sf_dir]
set -u
SF_DIR="${1:-/root/testdata/sf0.001}"
cd "$(dirname "$0")/.."

fail=0

echo "== gate 1/3: pytest tests/test_engine.py =="
python -m pytest tests/test_engine.py -x -q || fail=1

echo "== gate 2/3: FULL oracle sweep (every queries() entry vs DuckDB) =="
# r14 shipped a crash that 3 spot-checks missed but any non-agg SELECT hit;
# the full sweep (~4 min at sf0.001) makes a crash in ANY path block the round.
python scripts/check_oracle.py "$SF_DIR" || fail=1

echo "== gate 3/3: driver entry smoke =="
timeout 300 python - <<'EOF' || fail=1
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master('local[4]')
  .config('spark.sql.shuffle.partitions','8')
  .config('spark.ui.enabled','false').appName('round_gate').getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import __spark_entry__
df = __spark_entry__.entry(spark)
n = df.count()
assert n >= 0, "entry() returned negative rows?"
print(f"entry() OK: {n} rows, schema {df.columns}")
EOF

if [ "$fail" -ne 0 ]; then
  echo "ROUND GATE: RED — do not end the round in this state" >&2
  exit 1
fi
echo "ROUND GATE: GREEN"
