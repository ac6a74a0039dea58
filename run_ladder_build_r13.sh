#!/bin/bash
# Round-13: rebuild the 1000x probe dataset (the /tmp dirs did not
# survive the round boundary). Same ladder-on-ladder recipe as r11/r12:
# 100x from sf0.1 (100-branch union, keys shifted per probe_sf1._scale),
# then x10 on that directory — never a 1000-branch plan.
set -eu
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=24g

echo "=== rung 1: sf0.1 x100 -> /tmp/fcs_scale100 ==="
SPARK_GRAFT_PROBE_SRC=/root/testdata/sf0.1 \
SPARK_GRAFT_PROBE_COPIES=100 \
python - <<'EOF'
import os, sys
sys.path.insert(0, '/root/repo')
from probe_sf1 import _scale
from flink_cookbook_spark.session import get_spark
out = '/tmp/fcs_scale100'
spark = get_spark(app_name='fcs-ladder-build-100x')
if not os.path.exists(os.path.join(out, '_SCALED_OK')):
    _scale(spark, out)
    open(os.path.join(out, '_SCALED_OK'), 'w').close()
print('100x done')
EOF

echo "=== rung 2: 100x dir x10 -> /tmp/fcs_scale1000 ==="
SPARK_GRAFT_PROBE_SRC=/tmp/fcs_scale100 \
SPARK_GRAFT_PROBE_COPIES=10 \
python - <<'EOF'
import os, sys
sys.path.insert(0, '/root/repo')
from probe_sf1 import _scale
from flink_cookbook_spark.session import get_spark
out = '/tmp/fcs_scale1000'
spark = get_spark(app_name='fcs-ladder-build-1000x')
if not os.path.exists(os.path.join(out, '_SCALED_OK')):
    _scale(spark, out)
    open(os.path.join(out, '_SCALED_OK'), 'w').close()
print('1000x done')
EOF
echo "LADDER_BUILD_RC=0"
