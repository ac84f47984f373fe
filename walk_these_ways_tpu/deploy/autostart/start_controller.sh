#!/bin/bash
# Start the policy controller container on boot (counterpart of reference
# go1_gym_deploy/autostart/start_controller.sh).
sudo docker stop wtw_controller || true
sudo docker rm wtw_controller || true
cd "$(dirname "$0")/../docker"
sudo make autostart
