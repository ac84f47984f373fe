"""Cross-engine oracle: the reference's PRETRAINED adaptation module vs this sim.

The strongest physics-parity check available in this environment.  The
reference checkout ships the pretrained run's adaptation module
(runs/gait-conditioned-agility/pretrain-v0/.../adaptation_module_latest.jit
— body_latest.jit is absent, so the full policy rollout protocol of
reference scripts/play.py:101-136 cannot be reconstructed).  The adaptation
module was trained purely on IsaacGym/PhysX rollouts to regress the true
(friction, restitution) privileged state from the 30-step observation
history (reference go1_gym_learn/ppo_cse/ppo.py:163-192).

If THIS engine's dynamics and observation pipeline match the reference's,
then trajectories generated HERE must be in-distribution for that module:
feeding it our obs histories should recover our sim's true normalized
friction/restitution with an error comparable to its in-training test loss.
If our physics or obs layout/scaling were off, a module trained on another
engine's data would regress garbage.

Protocol: N envs, full MoB domain randomization, our trained walking policy
(runs/long_run) driving; after a warmup (so the 30x70 history fills with
steady-state gait), collect (obs_history, true priv obs) pairs and score
both the reference module and our own trained module on MSE + per-target
correlation.

Usage: python scripts/validate_adaptation_cross_engine.py \
           [--policy runs/long_run/checkpoints/policy_latest.npz] \
           [--reference resources/reference_policy/pretrain_v0_policy.npz]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mlp_elu(z, prefix, n, x):
    for i in range(n):
        x = x @ z[f"{prefix}/w{i}"] + z[f"{prefix}/b{i}"]
        if i < n - 1:
            x = np.where(x > 0, x, np.expm1(np.minimum(x, 0)))
    return x


def main(policy_path, reference_path, num_envs, warmup_steps, collect_steps,
         out_path, cpu=False, save_data=None):
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.go1_config import mob_train_cfg

    cfg = mob_train_cfg(num_envs=num_envs)
    env = LeggedRobotEnv(cfg)
    pol = np.load(policy_path)
    ref = np.load(reference_path)

    wp = {k: jnp.asarray(v) for k, v in pol.items()}

    def policy(hist):
        x = hist
        for i in range(3):
            x = x @ wp[f"adaptation/w{i}"] + wp[f"adaptation/b{i}"]
            if i < 2:
                x = jax.nn.elu(x)
        latent = x
        x = jnp.concatenate([hist, latent], axis=-1)
        for i in range(4):
            x = x @ wp[f"actor/w{i}"] + wp[f"actor/b{i}"]
            if i < 3:
                x = jax.nn.elu(x)
        return x

    @jax.jit
    def step_fn(state, obs):
        actions = policy(obs["obs_history"])
        return env.step(state, actions)

    state, obs = env.reset(jax.random.PRNGKey(7))
    for _ in range(warmup_steps):
        state, obs, _, _, _ = step_fn(state, obs)

    hists, privs = [], []
    for t in range(collect_steps):
        state, obs, _, _, _ = step_fn(state, obs)
        if (t + 1) % 10 == 0:  # decorrelate samples
            hists.append(np.asarray(obs["obs_history"]))
            privs.append(np.asarray(obs["privileged_obs"]))
    H = np.concatenate(hists, axis=0)
    P = np.concatenate(privs, axis=0)
    if save_data:
        np.savez_compressed(save_data, H=H, P=P)

    pred_ref = mlp_elu(ref, "adaptation", 3, H)
    pred_ours = mlp_elu(pol, "adaptation", 3, H)

    def score(pred):
        mse = float(np.mean(np.square(pred - P)))
        corr = [float(np.corrcoef(pred[:, j], P[:, j])[0, 1])
                for j in range(P.shape[1])]
        # affine-calibrated R^2 per dim: how much target variance ANY
        # linear readout of this prediction explains — separates "module
        # carries signal with a scale/offset mismatch" from "no signal"
        r2 = [float(np.corrcoef(pred[:, j], P[:, j])[0, 1] ** 2)
              for j in range(P.shape[1])]
        stats = {"pred_mean": pred.mean(0).tolist(),
                 "pred_std": pred.std(0).tolist()}
        return mse, corr, r2, stats

    mse_ref, corr_ref, r2_ref, st_ref = score(pred_ref)
    mse_ours, corr_ours, r2_ours, st_ours = score(pred_ours)

    # Controls for the in-distribution claim: the reference module is an
    # MLP trained only on IsaacGym rollouts — if our histories were
    # out-of-distribution (wrong layout/scales/dynamics), its outputs blow
    # up (observed: +-800 on feature-shuffled inputs) instead of landing in
    # the training target range.
    rng = np.random.RandomState(0)
    Hs = H.copy()
    for row in Hs:
        rng.shuffle(row)
    Hg = H.mean(0) + H.std(0) * rng.randn(*H.shape).astype(np.float32)
    pred_shuf = mlp_elu(ref, "adaptation", 3, Hs)
    pred_gauss = mlp_elu(ref, "adaptation", 3, Hg)
    controls = {
        name: {"pred_mean": p.mean(0).tolist(), "pred_std": p.std(0).tolist()}
        for name, p in [("feature_shuffled", pred_shuf),
                        ("marginal_gaussian", pred_gauss)]
    }
    # baseline: predicting the overall mean (what a module regressing
    # garbage would converge to)
    mse_null = float(np.mean(np.square(P - P.mean(axis=0, keepdims=True))))

    result = {
        "samples": int(H.shape[0]),
        "mse_reference_module": mse_ref,
        "mse_our_module": mse_ours,
        "mse_predict_mean_baseline": mse_null,
        "corr_reference_module": {"friction": corr_ref[0],
                                  "restitution": corr_ref[1]},
        "corr_our_module": {"friction": corr_ours[0],
                            "restitution": corr_ours[1]},
        "r2_reference_module": r2_ref,
        "r2_our_module": r2_ours,
        "target_mean": P.mean(0).tolist(),
        "target_std": P.std(0).tolist(),
        "pred_stats_reference": st_ref,
        "pred_stats_ours": st_ours,
        "controls_reference_module": controls,
        "policy": policy_path,
        "reference": reference_path,
        "num_envs": num_envs,
        "warmup_steps": warmup_steps,
        "collect_steps": collect_steps,
    }
    print(json.dumps(result, indent=2))
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {out_path}")
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy",
                    default="runs/long_run/checkpoints/policy_latest.npz")
    ap.add_argument("--reference",
                    default="resources/reference_policy/pretrain_v0_policy.npz")
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--warmup-steps", type=int, default=150)
    ap.add_argument("--collect-steps", type=int, default=200)
    ap.add_argument("--out",
                    default="runs/cross_engine_validation/adaptation.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save-data", default=None)
    a = ap.parse_args()
    if not os.path.exists(a.policy):
        # run-dir checkpoints are no longer committed to git (binary
        # artifacts); on a fresh clone you must train/export one first
        ap.error(
            f"policy artifact not found: {a.policy}\n"
            "Exported policies live in <run_dir>/checkpoints/"
            "policy_latest.npz and are not committed to git — train one "
            "(scripts/train.py) or pass --policy to an existing export.")
    main(a.policy, a.reference, a.num_envs, a.warmup_steps, a.collect_steps,
         a.out, cpu=a.cpu, save_data=a.save_data)
