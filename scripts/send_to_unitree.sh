#!/bin/bash
# Sync the deploy stack + trained runs to the Go1's onboard computer
# (counterpart of reference go1_gym_deploy/scripts/send_to_unitree.sh).
#
# Usage: scripts/send_to_unitree.sh [user@host]   (default unitree@192.168.123.15)
set -e
DEST="${1:-unitree@192.168.123.15}"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"

rsync -av -e ssh \
    --exclude='*.mp4' --exclude='__pycache__' --exclude='.jax_cache' \
    "$ROOT/walk_these_ways_tpu" \
    "$ROOT/resources" \
    "$ROOT/runs" \
    "$DEST:/home/unitree/go1_gym"

echo "Synced to $DEST:/home/unitree/go1_gym"
echo "Next (on the robot): walk_these_ways_tpu/deploy/installer/install_deployment_code.sh"
