#!/usr/bin/env bash
# Full-suite runner, sharded (VERDICT r2 item 7: one-off XLA-compile
# segfaults on this 1-core host killed single-process full runs at ~66%;
# two shards bound the blast radius and make a crash diagnosable — pytest's
# built-in faulthandler prints the crashing test's stack, and the other
# shard's result survives).
#
#   bash tests/run_suite.sh            # both shards, exit 1 if either fails
#
# Shard 1: kernel/engine-heavy files (the compile-intensive half).
# Shard 2: everything else (models, serving, app, graph, CLI).
set -u
cd "$(dirname "$0")/.."

HEAVY="tests/test_ops_scoring.py tests/test_quant.py tests/test_engine.py \
tests/test_scale_mesh.py tests/test_streaming.py tests/test_attention.py \
tests/test_kv_quant.py tests/test_checkpoint.py"

rc=0
echo "=== shard 1/2: kernels + engine ==="
python -m pytest $HEAVY -q -p faulthandler || rc=1
echo "=== shard 2/2: models + serving + app ==="
python -m pytest tests/ -q -p faulthandler \
  $(for f in $HEAVY; do printf -- "--ignore=%s " "$f"; done) || rc=1
exit $rc
