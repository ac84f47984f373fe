#!/bin/bash
# Round-5 learning-curve benchmark: the SHIPPING physics at a CLEAN SHA.
#
# 3 seeds x 4000 iterations x 4000 envs, full MoB config, one v5e chip —
# the protocol of runs/benchmark_curve_r4, re-run on the round-4 physics
# overhaul (row-decoupled exact-cone solver + midpoint integrator +
# envelope guard) which landed AFTER that study's SHA.  Seeds run
# sequentially (the axon TPU tunnel serves one client at a time), each
# followed by the play protocol on its exported policy.
#
# WTW_REQUIRE_CLEAN=1 makes Runner refuse to start from a dirty tree, so
# every provenance.json here is guaranteed git_dirty=false.
set -u
cd "$(dirname "$0")/../.."
export WTW_REQUIRE_CLEAN=1
DIR=runs/benchmark_curve_r5
for SEED in 1 2 3; do
  echo "=== seed $SEED: $(date -Is) loadavg $(cut -d' ' -f1-3 /proc/loadavg)"
  timeout 10800 python scripts/train.py --num-envs 4000 --iterations 4000 \
    --seed "$SEED" --log-dir "$DIR/seed$SEED" \
    > "$DIR/seed$SEED.log" 2>&1
  echo "seed $SEED train rc=$?"
  timeout 1800 python scripts/play.py \
    --policy "$DIR/seed$SEED/checkpoints/policy_latest.npz" \
    > "$DIR/seed$SEED.play.log" 2>&1
  echo "seed $SEED play rc=$?"
done
echo "=== all seeds done: $(date -Is)"
