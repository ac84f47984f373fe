#!/bin/bash
# Go1 deployment installation (counterpart of reference
# go1_gym_deploy/installer/install_deployment_code.sh).
#
# Run ON the robot's onboard computer (Jetson NX, 192.168.123.15) after
# syncing the repo with scripts/send_to_unitree.sh.  Loads or builds the
# deployment docker image and compiles the native UDP bridge.
set -e

echo "=============================================="
echo "== Go1 sim-to-real installation (WTW-TPU)   =="
echo "=============================================="
echo ""
echo "This software is intended to support controls research.  It includes"
echo "safety features (position/torque limits, power protect, e-stop) but"
echo "may still damage your Go1.  The user assumes all risk."
echo ""

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../../.." && pwd)"

read -r -p "[Step 1] Load prebuilt docker image if present, else build? [y/N] " response
if [[ "$response" =~ ^([yY][eE][sS]|[yY])$ ]]; then
    if [ -f "$HERE/../scripts/deployment_image.tar" ]; then
        echo "Loading prebuilt image..."
        docker load -i "$HERE/../scripts/deployment_image.tar"
    else
        echo "No deployment_image.tar found; building locally..."
        (cd "$HERE/../docker" && make build)
    fi
    echo "Done."
else
    echo "Skipping docker image."
fi

read -r -p "[Step 2] Build the native UDP bridge (deploy/cpp)? [y/N] " response
if [[ "$response" =~ ^([yY][eE][sS]|[yY])$ ]]; then
    (cd "$HERE/../cpp" && make)
    echo "Built $HERE/../cpp/udp_bridge."
    echo "NOTE: linking against the proprietary Unitree legged SDK requires"
    echo "UNITREE_SDK_DIR to be set; without it the bridge runs with the"
    echo "loopback sim backend only (see deploy/cpp/Makefile)."
else
    echo "Skipping bridge build."
fi

read -r -p "[Step 3] Install autostart entries (controller on boot)? [y/N] " response
if [[ "$response" =~ ^([yY][eE][sS]|[yY])$ ]]; then
    CRON_BRIDGE="@reboot $REPO/walk_these_ways_tpu/deploy/autostart/start_unitree_bridge.sh"
    CRON_CTRL="@reboot sleep 10 && $REPO/walk_these_ways_tpu/deploy/autostart/start_controller.sh"
    (crontab -l 2>/dev/null | grep -v start_unitree_bridge | grep -v start_controller; \
     echo "$CRON_BRIDGE"; echo "$CRON_CTRL") | crontab -
    echo "Autostart installed (crontab @reboot)."
else
    echo "Skipping autostart."
fi

echo ""
echo "Install complete.  Manual start:"
echo "  1. $REPO/walk_these_ways_tpu/deploy/autostart/start_unitree_bridge.sh"
echo "  2. $REPO/walk_these_ways_tpu/deploy/autostart/start_controller.sh"
