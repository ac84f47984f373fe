"""Deployment extras: camera pipeline, command-profile family, actuator-net
eval (reference go1_gym_deploy/lcm_types/camera_message_*,
utils/command_profile.py, scripts/actuator_net/eval.py)."""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from walk_these_ways_tpu.deploy import messages as msg
from walk_these_ways_tpu.deploy.command_profile import (
    ConstantAccelerationProfile, ElegantForwardProfile, ElegantGaitProfile,
    ElegantYawProfile, KeyboardCommandProfile, RCControllerProfileAccel)

REPO = os.path.join(os.path.dirname(__file__), "..")


# ---------------------------------------------------------------------------
# camera frames
# ---------------------------------------------------------------------------

def test_camera_frame_roundtrip_small():
    """Rect image (116x100x3, reference camera_message_rect_wide)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (116, 100, 3), dtype=np.uint8)
    frags = msg.CameraFrame.encode_fragments(cam_id=1, frame_seq=7, image=img)
    assert len(frags) == int(np.ceil(img.nbytes / msg.CameraFrame.MAX_FRAG))
    asm = msg.FrameAssembler()
    out = None
    for frag in frags:
        out = asm.push(frag)
    assert out is not None
    cam, got = out
    assert cam == 1
    np.testing.assert_array_equal(got, img)


def test_camera_frame_roundtrip_large_out_of_order():
    """Raw frame (200x464x3 = 278400 B, reference camera_message_lcmt) spans
    multiple fragments; reassembly is order-independent."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (200, 464, 3), dtype=np.uint8)
    frags = msg.CameraFrame.encode_fragments(cam_id=3, frame_seq=42, image=img)
    assert len(frags) == int(np.ceil(278400 / msg.CameraFrame.MAX_FRAG))
    asm = msg.FrameAssembler()
    order = rng.permutation(len(frags))
    outs = [asm.push(frags[i]) for i in order]
    assert all(o is None for o in outs[:-1])
    cam, got = outs[-1]
    assert cam == 3
    np.testing.assert_array_equal(got, img)


def test_camera_frame_drops_stale_sequence():
    """A newer frame_seq supersedes a half-received frame."""
    rng = np.random.RandomState(2)
    img_a = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    img_b = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    small = msg.CameraFrame
    old_max = small.MAX_FRAG
    try:
        small.MAX_FRAG = 4096            # force multi-fragment
        frags_a = small.encode_fragments(1, 1, img_a)
        frags_b = small.encode_fragments(1, 2, img_b)
        asm = msg.FrameAssembler()
        assert asm.push(frags_a[0]) is None          # partial old frame
        outs = [asm.push(f) for f in frags_b]
        cam, got = outs[-1]
        np.testing.assert_array_equal(got, img_b)
    finally:
        small.MAX_FRAG = old_max


def test_state_estimator_camera_pipeline():
    """Fragments published on the bus land in camera_images via the SE
    callback (reference cheetah_state_estimator.py:114-124,318-334)."""
    from walk_these_ways_tpu.deploy.bus import Bus
    from walk_these_ways_tpu.deploy.state_estimator import StateEstimator

    bus = Bus(port=7801)
    try:
        se = StateEstimator(bus, use_cameras=True)
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (116, 100, 3), dtype=np.uint8)
        for frag in msg.CameraFrame.encode_fragments(2, 0, img):
            bus.publish(msg.CHANNEL_CAMERA, frag)
        for _ in range(10):
            if not bus.handle_once(timeout=0.5):
                break
        got = se.get_camera_bottom()                 # cam_id 2 -> "bottom"
        assert got is not None
        np.testing.assert_array_equal(got, img)
        assert se.get_camera_front() is None
    finally:
        bus.close()


# ---------------------------------------------------------------------------
# command profiles
# ---------------------------------------------------------------------------

def test_elegant_forward_profile():
    p = ElegantForwardProfile(dt=0.02, max_speed=2.0, accel_time=1.0,
                              duration=2.0, deaccel_time=1.0)
    v0, _ = p.get_command(0.0)
    v_mid, _ = p.get_command(2.0)
    v_end, _ = p.get_command(3.9)
    assert v0[0] == 0.0
    assert v_mid[0] == pytest.approx(2.0)
    assert v_end[0] < 0.5
    # only vx is driven
    assert np.all(v_mid[1:] == 0.0)


def test_elegant_yaw_profile():
    p = ElegantYawProfile(dt=0.02, max_speed=1.0, zero_buf_time=0.5,
                          accel_time=0.5, duration=1.0, deaccel_time=0.5,
                          yaw_rate=0.7)
    v_buf, _ = p.get_command(0.25)
    v_hold, _ = p.get_command(1.5)
    assert v_buf[0] == 0.0 and v_buf[2] == 0.0
    assert v_hold[0] == pytest.approx(1.0)
    assert v_hold[2] == pytest.approx(0.7)


def test_elegant_gait_profile(tmp_path):
    seq = {"x_vel_cmd": [0.0, 1.0, 1.5], "yaw_vel_cmd": [0.0, 0.0, 0.3],
           "height_cmd": [0.0, 0.1, 0.1], "frequency_cmd": [3.0, 3.0, 3.0],
           "offset_cmd": [0.0, 0.0, 0.0], "phase_cmd": [0.5, 0.5, 0.5],
           "bound_cmd": [0.0, 0.0, 0.0], "duration_cmd": [0.5, 0.5, 0.5]}
    path = tmp_path / "gait.json"
    path.write_text(json.dumps(seq))
    p = ElegantGaitProfile(dt=1.0, path=str(path))
    c1, _ = p.get_command(1.0)
    assert c1[0] == 1.0 and c1[4] == 3.0 and c1[5] == 0.5
    c2, _ = p.get_command(2.0)
    assert c2[0] == 1.5 and c2[2] == pytest.approx(0.3)


class _FakeSE:
    def __init__(self):
        self.cmd = np.zeros(19)
        self.buttons = np.zeros(4)

    def get_command(self):
        return self.cmd.copy()

    def get_buttons(self):
        return self.buttons.copy()


def test_rc_accel_profile_integrates():
    se = _FakeSE()
    p = RCControllerProfileAccel(dt=0.02, state_estimator=se, x_scale=1.0)
    se.cmd[0] = 1.0                      # constant stick deflection
    for _ in range(100):
        cmd, _ = p.get_command(0.0)
    assert cmd[0] == pytest.approx(100 * 1.0 / 100.0)   # integrated accel
    se.cmd[0] = 0.0
    cmd2, _ = p.get_command(0.0)
    assert cmd2[0] == pytest.approx(cmd[0])             # velocity holds


def test_rc_accel_triggered_command():
    se = _FakeSE()
    p = RCControllerProfileAccel(dt=0.02, state_estimator=se)
    trig = ConstantAccelerationProfile(dt=0.02, max_speed=2.0, accel_time=0.1)
    p.register_triggered_command(0, trig)
    se.buttons[0] = 1
    cmd, _ = p.get_command(5.0)
    assert cmd[0] == pytest.approx(2.0)                 # profile overrides


def test_keyboard_profile_keys():
    p = KeyboardCommandProfile(dt=0.02, x_scale=2.0, yaw_scale=0.5)
    p.press("w")
    cmd, _ = p.get_command(0.0)
    assert cmd[0] == pytest.approx(2.0)
    p.press("w")                                        # toggle off
    cmd, _ = p.get_command(0.0)
    assert cmd[0] == 0.0
    p.press("q")
    cmd, _ = p.get_command(0.0)
    assert cmd[2] == pytest.approx(0.5)
    p.press(" ")                                        # space zeroes
    cmd, _ = p.get_command(0.0)
    assert np.all(cmd[:3] == 0.0)
    # gait defaults preserved (trot)
    assert cmd[4] == 3.0 and cmd[5] == 0.5


# ---------------------------------------------------------------------------
# actuator-net eval script
# ---------------------------------------------------------------------------

def test_actuator_net_eval_script(tmp_path):
    """End-to-end: synthetic PD-behaved log -> eval JSON with finite scores
    (reference scripts/actuator_net/eval.py protocol)."""
    rng = np.random.RandomState(0)
    T = 120
    q = 0.1 * rng.randn(T, 12)
    qd = 0.5 * rng.randn(T, 12)
    q_tgt = q + 0.05 * rng.randn(T, 12)
    tau = 20.0 * (q_tgt - q) - 0.5 * qd
    log = {"ep0": {"joint_pos": [q], "joint_vel": [qd],
                   "joint_pos_target": [q_tgt], "tau_est": [tau],
                   "torques": [tau]}}
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    with open(log_dir / "log_0.pkl", "wb") as f:
        pickle.dump(log, f)

    out = tmp_path / "eval.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "actuator_net_eval.py"),
         "--log-dir", str(log_dir), "--out", str(out)],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO},
        timeout=300)
    assert r.returncode == 0, r.stderr
    res = json.loads(out.read_text())
    assert res["samples"] == (T - 2) * 12
    assert np.isfinite(res["mse"]) and np.isfinite(res["r2"])
    assert np.isfinite(res["mse_pd_baseline"])
    assert len(res["per_joint"]) == 12


def test_network_config_interface_discovery(monkeypatch, tmp_path):
    """network_config finds exactly the robot-subnet interface from
    `ip -o -4 addr` output (reference network_config_unitree.py:18-52)."""
    import subprocess
    from walk_these_ways_tpu.deploy import network_config as nc

    fake = ("1: lo    inet 127.0.0.1/8 scope host lo\\       "
            "valid_lft forever preferred_lft forever\n"
            "2: eth0    inet 10.0.0.5/24 brd 10.0.0.255 scope global eth0\n"
            "3: eth1    inet 192.168.123.14/24 brd 192.168.123.255 "
            "scope global eth1\n")

    class R:
        stdout = fake

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    ifs = nc.list_interfaces()
    assert ifs == {"lo": ["127.0.0.1"], "eth0": ["10.0.0.5"],
                   "eth1": ["192.168.123.14"]}
    assert nc.get_likely_iface() == "eth1"


def test_check_camera_msgs_self_test():
    """The camera-rate checker (reference tests/check_camera_msgs.py
    analog) receives, reassembles and rates synthetic frames over the
    loopback bus."""
    from walk_these_ways_tpu.deploy.check_camera_msgs import main

    rep = main(seconds=1.0, self_test=True)
    assert "front" in rep
    fps, shape = rep["front"]
    assert fps > 5.0
    assert shape == (30, 40, 3)
