#!/bin/bash
# Start the native UDP bridge on boot (counterpart of reference
# go1_gym_deploy/autostart/start_unitree_sdk.sh, which launches
# lcm_position).  The bridge is the only process that talks to the
# Unitree SDK; it must be up before the controller container starts.
sudo docker stop wtw_controller || true
sudo docker rm wtw_controller || true
# stop a previous bridge instance by pidfile (never by name pattern)
PIDFILE=/tmp/wtw_udp_bridge.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    sudo kill "$(cat "$PIDFILE")"
fi
cd "$(dirname "$0")/../cpp"
yes "" | sudo ./udp_bridge &
echo $! | sudo tee "$PIDFILE" >/dev/null
