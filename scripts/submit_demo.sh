#!/usr/bin/env bash
# Cluster-shipping demo (north_rule: spark-submit --py-files).
# Verified in-sandbox against local[4]; on a cluster swap --master.
set -euo pipefail
cd "$(dirname "$0")/.."
zip -qr /tmp/hoshizora_spark.zip hoshizora_spark
printf '0 1\n1 2\n2 0\n3 4\n4 5\n5 3\n2 3\n' > /tmp/demo_edges.txt
cat > /tmp/demo_job.py <<'EOF'
import sys
from hoshizora_spark.cli import main
sys.exit(main(sys.argv[1:]))
EOF
exec spark-submit --master "${SPARK_MASTER:-local[4]}" \
  --py-files /tmp/hoshizora_spark.zip /tmp/demo_job.py pagerank /tmp/demo_edges.txt 20
