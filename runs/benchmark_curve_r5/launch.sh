#!/bin/bash
# Round-5 flagship learning-evidence chain, run from the PINNED WORKTREE
# /root/repo/.bench_worktree (detached at the clean pre-flight SHA) so every
# provenance.json in this study records the same git_sha with
# git_dirty=false, regardless of continuing development in the main tree.
#
#   phase 1  benchmark_curve_r5: 3 seeds x 4000 iters x 4000 envs
#            (the runs/benchmark_curve_r4 protocol, on the shipping
#            round-4 physics) + play protocol per seed
#   phase 2  long_run_r5: 2 seeds x 8000 iters (late-stage robustness,
#            where seed-2-style blowups historically appeared) + play
#   phase 3  validate_rough_r5: 1500 iters on the rough heightfield
#            config (learning sanity for the XLA-fallback terrain path)
#
# Seeds run SEQUENTIALLY: the axon TPU tunnel serves one client at a time.
# WTW_REQUIRE_CLEAN=1 makes Runner hard-refuse a dirty tree.
set -u
WT=/root/repo/.bench_worktree
OUT=/root/repo/runs
cd "$WT"
export WTW_REQUIRE_CLEAN=1

for SEED in 1 2 3; do
  echo "=== bench seed $SEED: $(date -Is) loadavg $(cut -d' ' -f1-3 /proc/loadavg)"
  timeout 10800 python scripts/train.py --num-envs 4000 --iterations 4000 \
    --seed "$SEED" --log-dir "$OUT/benchmark_curve_r5/seed$SEED" \
    > "$OUT/benchmark_curve_r5/seed$SEED.log" 2>&1
  echo "bench seed $SEED train rc=$?"
  timeout 1800 python scripts/play.py \
    --policy "$OUT/benchmark_curve_r5/seed$SEED/checkpoints/policy_latest.npz" \
    > "$OUT/benchmark_curve_r5/seed$SEED.play.log" 2>&1
  echo "bench seed $SEED play rc=$?"
done

mkdir -p "$OUT/long_run_r5"
for SEED in 1 2; do
  echo "=== long seed $SEED: $(date -Is) loadavg $(cut -d' ' -f1-3 /proc/loadavg)"
  timeout 18000 python scripts/train.py --num-envs 4000 --iterations 8000 \
    --seed "$SEED" --log-dir "$OUT/long_run_r5/seed$SEED" \
    > "$OUT/long_run_r5/seed$SEED.log" 2>&1
  echo "long seed $SEED train rc=$?"
  timeout 1800 python scripts/play.py \
    --policy "$OUT/long_run_r5/seed$SEED/checkpoints/policy_latest.npz" \
    > "$OUT/long_run_r5/seed$SEED.play.log" 2>&1
  echo "long seed $SEED play rc=$?"
done

mkdir -p "$OUT/validate_rough_r5"
echo "=== rough validate: $(date -Is) loadavg $(cut -d' ' -f1-3 /proc/loadavg)"
timeout 14400 python scripts/train.py --num-envs 4000 --iterations 1500 \
  --seed 1 --terrain rough --log-dir "$OUT/validate_rough_r5/seed1" \
  > "$OUT/validate_rough_r5/seed1.log" 2>&1
echo "rough validate rc=$?"

echo "=== chain done: $(date -Is)"
