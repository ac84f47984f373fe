"""Evaluate an actuator network against hardware deployment logs.

Rebuild of the reference evaluation entry point (reference:
scripts/actuator_net/eval.py, which calls
train_actuator_network_and_plot_predictions with load_pretrained_model=True,
scripts/actuator_net/utils.py:66-145): loads the trained softsign MLP
(npz, default the converted reference net), rebuilds the
(q_err x3, qd x3) -> tau dataset from the deploy logs, and reports
prediction error — overall and per joint — plus the PD-torque baseline the
actuator net must beat to be worth deploying.

Usage:
  python scripts/actuator_net_eval.py --log-dir deploy_logs \
      [--net resources/actuator_nets/unitree_go1.npz] [--out eval.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from actuator_net_train import build_dataset  # noqa: E402  (same dataset spec)


def load_net(path: str):
    from walk_these_ways_tpu.models import actuator_net as anet

    params = anet.load(path)

    def predict(x):
        import jax.numpy as jnp

        return np.asarray(anet.apply(params, jnp.asarray(x)))

    return predict


def pd_baseline(log_dir: str, kp: float = 20.0, kd: float = 0.5):
    """tau = kp*err - kd*qd on the same samples (the model the actuator net
    replaces; reference legged_robot_config.py control gains)."""
    x, y = build_dataset(log_dir)
    tau_pd = kp * x[:, 0] - kd * x[:, 3]
    return float(np.mean((tau_pd - y[:, 0]) ** 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", default="deploy_logs")
    ap.add_argument("--net", default="resources/actuator_nets/unitree_go1.npz")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()

    x, y = build_dataset(a.log_dir)
    predict = load_net(a.net)
    pred = predict(x)
    err = pred.reshape(-1) - y.reshape(-1)
    mse = float(np.mean(err ** 2))
    var = float(np.var(y))
    r2 = 1.0 - mse / max(var, 1e-9)

    # per-joint breakdown: dataset rows are emitted 12 joints at a time
    per_joint = {}
    nj = 12
    if x.shape[0] % nj == 0:
        e = err.reshape(-1, nj)
        yv = y.reshape(-1, nj)
        for j in range(nj):
            per_joint[f"joint_{j}"] = {
                "mse": float(np.mean(e[:, j] ** 2)),
                "r2": float(1.0 - np.mean(e[:, j] ** 2)
                            / max(np.var(yv[:, j]), 1e-9)),
            }

    result = {
        "net": a.net,
        "log_dir": a.log_dir,
        "samples": int(x.shape[0]),
        "mse": mse,
        "r2": r2,
        "mse_pd_baseline": pd_baseline(a.log_dir),
        "per_joint": per_joint,
    }
    print(json.dumps({k: v for k, v in result.items() if k != "per_joint"}))
    if per_joint:
        for j, stats in per_joint.items():
            print(f"  {j}: mse={stats['mse']:.4f} r2={stats['r2']:.3f}")
    if a.out:
        with open(a.out, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
