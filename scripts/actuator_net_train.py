"""Fit the actuator network from hardware deployment logs.

Rebuild of the reference pipeline (reference: scripts/actuator_net/utils.py:
66-230 `build_mlp`/`train_actuator_network` + log preprocessing, and
scripts/actuator_net/train.py / eval.py): consumes the pickled deploy logs
written by walk_these_ways_tpu.deploy.logger (log*.pkl with joint_pos,
joint_vel, joint_pos_target, tau_est, torques), builds the
(q_err, q_err-1, q_err-2, qd, qd-1, qd-2) -> tau dataset at 3-step history
spacing, and trains the softsign MLP 6->32->32->1 with Adam in JAX.

Usage:
  python scripts/actuator_net_train.py --log-dir deploy_logs \
      --out resources/actuator_nets/custom.npz
"""
import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_dataset(log_dir: str):
    """(reference utils.py:148-230: history spacing of 1 step at 50 Hz)"""
    xs, ys = [], []
    for path in sorted(glob.glob(os.path.join(log_dir, "log*.pkl"))):
        with open(path, "rb") as f:
            logs = pickle.load(f)
        for name, data in logs.items():
            if "joint_pos" not in data or "torques" not in data:
                continue
            q = np.concatenate(data["joint_pos"], axis=0)          # (T, 12)
            qd = np.concatenate(data["joint_vel"], axis=0)
            q_tgt = np.concatenate(data["joint_pos_target"], axis=0)
            tau = np.concatenate(
                data.get("tau_est", data["torques"]), axis=0)
            err = q_tgt - q
            T = err.shape[0]
            for t in range(2, T):
                feat = np.stack([err[t], err[t - 1], err[t - 2],
                                 qd[t], qd[t - 1], qd[t - 2]], axis=-1)
                xs.append(feat)        # (12, 6)
                ys.append(tau[t])      # (12,)
    if not xs:
        raise SystemExit(f"no usable logs in {log_dir}")
    x = np.concatenate(xs, axis=0).astype(np.float32)   # (T*12, 6)
    y = np.concatenate(ys, axis=0).astype(np.float32)[:, None]
    return x, y


def train(x, y, epochs: int = 100, batch_size: int = 128, lr: float = 8e-4,
          seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax
    from walk_these_ways_tpu.models import actuator_net as anet

    n = x.shape[0]
    n_train = n // 5 * 4
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    xtr, ytr = x[perm[:n_train]], y[perm[:n_train]]
    xte, yte = x[perm[n_train:]], y[perm[n_train:]]

    params = anet.init_random(seed)
    opt = optax.adam(lr, eps=1e-8)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = anet.apply(p, xb)
            return jnp.mean((pred - yb[:, 0]) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    steps_per_epoch = max(n_train // batch_size, 1)
    for epoch in range(epochs):
        ep_loss = 0.0
        idx = rng.permutation(n_train)
        for i in range(steps_per_epoch):
            b = idx[i * batch_size:(i + 1) * batch_size]
            params, opt_state, loss = step(params, opt_state, xtr[b], ytr[b])
            ep_loss += float(loss)
        if (epoch + 1) % 10 == 0:
            import jax.numpy as jnp
            test_loss = float(jnp.mean(
                (anet.apply(params, jnp.asarray(xte)) - yte[:, 0]) ** 2))
            print(f"epoch {epoch+1:3d} | train {ep_loss/steps_per_epoch:.4f}"
                  f" | test {test_loss:.4f}", flush=True)
    return params


def save(params, out: str):
    np.savez(out,
             w0=np.asarray(params.w0), b0=np.asarray(params.b0),
             w1=np.asarray(params.w1), b1=np.asarray(params.b1),
             w2=np.asarray(params.w2), b2=np.asarray(params.b2))
    print(f"saved actuator net to {out}")


def main():

    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", default="deploy_logs")
    ap.add_argument("--out", default="resources/actuator_nets/custom.npz")
    ap.add_argument("--epochs", type=int, default=100)
    a = ap.parse_args()
    x, y = build_dataset(a.log_dir)
    print(f"dataset: {x.shape[0]} samples")
    params = train(x, y, epochs=a.epochs)
    save(params, a.out)


if __name__ == "__main__":
    main()
