"""Deployment stack tests: message codecs, the UDP bus, and a full loopback
integration test against the C++ bridge in --sim mode."""
import os
import subprocess
import time

import numpy as np
import pytest

from walk_these_ways_tpu.deploy import messages as msg
from walk_these_ways_tpu.deploy.bus import Bus

CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "walk_these_ways_tpu", "deploy", "cpp")


def test_message_roundtrip():
    m = msg.LegControlData(q=list(np.arange(12.0)), qd=list(np.arange(12.0) * 2),
                           tau_est=list(np.arange(12.0) * 3))
    m2 = msg.LegControlData.decode(m.encode())
    np.testing.assert_allclose(m2.q, m.q)
    np.testing.assert_allclose(m2.tau_est, m.tau_est)

    t = msg.PdTauTargets(q_des=[0.1] * 12, kp=[20.0] * 12, kd=[0.5] * 12, id=-1)
    t2 = msg.PdTauTargets.decode(t.encode())
    assert t2.id == -1
    np.testing.assert_allclose(t2.kp, t.kp)

    r = msg.RcCommand(left_stick_y=0.5, mode=2, right_upper_switch=1)
    r2 = msg.RcCommand.decode(r.encode())
    assert r2.mode == 2 and r2.right_upper_switch == 1
    assert abs(r2.left_stick_y - 0.5) < 1e-6

    s = msg.StateEstimate(rpy=[0.1, 0.2, 0.3], contact_estimate=[250.0] * 4)
    s2 = msg.StateEstimate.decode(s.encode())
    np.testing.assert_allclose(s2.rpy, s.rpy, atol=1e-6)


def test_bus_pubsub():
    bus = Bus(port=7801)
    got = []
    bus.subscribe("chan_a", lambda p: got.append(p))
    bus.publish("chan_a", b"hello")
    deadline = time.time() + 2.0
    while not got and time.time() < deadline:
        bus.handle_once(timeout=0.1)
    bus.close()
    assert got == [b"hello"]


@pytest.fixture(scope="module")
def bridge_binary():
    exe = os.path.join(CPP_DIR, "udp_bridge")
    subprocess.run(["make", "-C", CPP_DIR], check=True, capture_output=True)
    return exe


def test_bridge_loopback(bridge_binary):
    """End-to-end: C++ bridge (sim robot) <-> Python bus.

    Publishes PD targets, expects the sim robot's joints to move toward them
    in the republished leg_control_data (the reference's install check is a
    similar loopback, go1_gym_deploy/tests/check_camera_msgs.py)."""
    proc = subprocess.Popen([bridge_binary, "--sim", "--ticks", "4000"],
                            stdout=subprocess.PIPE)
    try:
        bus = Bus()
        legdata = []
        bus.subscribe(msg.CHANNEL_LEG_CONTROL,
                      lambda p: legdata.append(msg.LegControlData.decode(p)))
        # wait for the bridge to come up
        deadline = time.time() + 5.0
        while not legdata and time.time() < deadline:
            bus.handle_once(timeout=0.1)
        assert legdata, "no leg_control_data from bridge"

        # per-leg (hip, thigh, calf) targets inside the joint limits — the
        # bridge's PositionLimit layer clamps anything outside
        q_des = [0.3, 0.9, -1.8] * 4
        target = msg.PdTauTargets(q_des=q_des, kp=[20.0] * 12,
                                  kd=[0.5] * 12)
        t_end = time.time() + 3.0
        while time.time() < t_end:
            bus.publish(msg.CHANNEL_PD_TARGETS, target.encode())
            for _ in range(20):   # drain the 500 Hz telemetry flood
                bus.handle_once(timeout=0.001)
        q = np.array(legdata[-1].q)
        bus.close()
        assert np.all(np.abs(q - np.array(q_des)) < 0.1), (
            f"joints did not track: {q} ({len(legdata)} msgs)")
    finally:
        proc.terminate()
        proc.wait(timeout=5)


def test_export_policy_load_student_roundtrip(tmp_path):
    """The deployment artifact (policy_latest.npz from Runner.export_policy)
    must reproduce the jitted student policy bit-for-bit: the numpy-only
    deploy-side MLP (deploy_policy.load_student_policy) vs
    actor_critic.actor_mean on the same obs history (the contract the
    reference keeps between torch.jit exports and training,
    ppo_cse/__init__.py:240-251)."""
    import jax
    import jax.numpy as jnp

    from walk_these_ways_tpu.deploy.deploy_policy import load_student_policy
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.go1_config import small_train_cfg
    from walk_these_ways_tpu.learn.runner import Runner, RunnerArgs
    from walk_these_ways_tpu.models import actor_critic as ac

    cfg = small_train_cfg(num_envs=4)
    env = LeggedRobotEnv(cfg)
    runner = Runner(env, log_dir=str(tmp_path), seed=3)
    runner.export_policy(str(tmp_path))

    policy = load_student_policy(str(tmp_path / "policy_latest.npz"))
    rng = np.random.RandomState(0)
    hist = rng.randn(1, env.num_obs_history).astype(np.float32)
    a_deploy = policy({"obs_history": hist})
    a_train = np.asarray(
        jax.jit(ac.actor_mean)(runner.train_state.params, jnp.asarray(hist)))[0]
    np.testing.assert_allclose(a_deploy, a_train, atol=1e-6)
