"""Policy evaluation rollout (sim "play").

Equivalent of reference scripts/play.py:17-162: load an exported policy
artifact (policy_latest.npz), run 1 env with DR off under a fixed trot
command at 1.5 m/s for 250 steps, and report tracking statistics.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_policy(path):
    """Student policy from the flat npz export (runner.export_policy).

    Variant-aware (meta/variant): 'cse' actor consumes obs_history+latent,
    'rma' consumes obs+latent; artifacts without meta keys are cse."""
    import numpy as np
    import jax.numpy as jnp
    from walk_these_ways_tpu.models import actor_critic as ac

    z = np.load(path)
    variant = str(z["meta/variant"]) if "meta/variant" in z else "cse"
    n_adapt = int(z["meta/n_adaptation"]) if "meta/n_adaptation" in z else 3
    n_actor = int(z["meta/n_actor"]) if "meta/n_actor" in z else 4
    def mlp(prefix, n):
        ws = tuple(jnp.asarray(z[f"{prefix}/w{i}"]) for i in range(n))
        bs = tuple(jnp.asarray(z[f"{prefix}/b{i}"]) for i in range(n))
        return ac.MLPParams(weights=ws, biases=bs)
    adaptation = mlp("adaptation", n_adapt)
    actor = mlp("actor", n_actor)

    def policy(obs_dict):
        hist = obs_dict["obs_history"]
        latent = ac.mlp_apply(adaptation, hist)
        body_in = obs_dict["obs"] if variant == "rma" else hist
        return ac.mlp_apply(
            actor, jnp.concatenate([body_in, latent], axis=-1))
    return policy


def play_go1(policy_path: str, steps: int = 250, plot: bool = False,
             plot_path: str = None, video_path: str = None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace
    from walk_these_ways_tpu.go1_config import mob_train_cfg
    from walk_these_ways_tpu.config import DomainRandCfg, NoiseCfg
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv

    cfg = mob_train_cfg(num_envs=1)
    # DR off, noise off (reference play.py:46-61)
    cfg = replace(cfg, domain_rand=DomainRandCfg(
        randomize_friction=False, randomize_restitution=False,
        randomize_base_mass=False, randomize_com_displacement=False,
        randomize_motor_strength=False, randomize_motor_offset=False,
        randomize_gravity=False, push_robots=False,
        randomize_lag_timesteps=True, lag_timesteps=6,
        randomize_Kp_factor=False, randomize_Kd_factor=False),
        noise=NoiseCfg(add_noise=False))
    env = LeggedRobotEnv(cfg)
    policy = load_policy(policy_path)

    # fixed trot command @ 1.5 m/s (reference play.py:101-136)
    gaits = {"pronk": [0, 0, 0], "trot": [0.5, 0, 0],
             "pace": [0, 0.5, 0], "bound": [0, 0, 0.5]}
    cmd = np.zeros(15, np.float32)
    cmd[0] = 1.5                  # x vel
    cmd[3] = 0.0                  # body height
    cmd[4] = 3.0                  # frequency
    cmd[5:8] = gaits["trot"]
    cmd[8] = 0.5                  # duration
    cmd[9] = 0.08                 # footswing height
    cmd[12] = 0.25                # stance width

    state, obs = env.reset(jax.random.PRNGKey(42))
    step = jax.jit(env.step)
    pol = jax.jit(policy)
    xs, vxs, qs, phys_frames = [], [], [], []
    for i in range(steps):
        state = state._replace(
            commands=jnp.asarray(cmd)[None, :].repeat(1, 0))
        actions = pol(obs)
        state, obs, rew, done, info = step(state, actions)
        from walk_these_ways_tpu.ops import quat as qops
        v_body = qops.quat_rotate_inverse(
            state.phys.base_quat, state.phys.base_lin_vel)
        vxs.append(float(v_body[0, 0]))
        xs.append(float(state.phys.base_pos[0, 0]))
        qs.append(np.asarray(state.phys.q[0]))
        if video_path:
            phys_frames.append(jax.tree.map(
                lambda x: np.asarray(x[0:1]), state.phys))
    import numpy as np
    vxs = np.array(vxs)
    qs = np.stack(qs)
    print(f"mean body-frame vx over rollout: {vxs.mean():.3f} m/s (target 1.5)")
    print(f"distance covered: {abs(xs[-1] - xs[0]):.2f} m along world-x "
          f"in {steps*env.dt:.1f} s (spawn yaw is randomized)")
    if video_path:
        # qualitative gait-inspection artifact (the reference ships a
        # training video with its pretrained run, e.g.
        # runs/.../videos/49750.mp4, captured via legged_robot.py:1592-1673)
        from walk_these_ways_tpu.utils.render import render_trajectory
        render_trajectory(env.model, phys_frames, video_path,
                          fps=int(1 / env.dt), stride=2)
        print(f"saved gait video to {video_path}")
    if plot:
        # measured-vs-desired velocity + joint positions figure
        # (reference play.py:140-157)
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
        t = np.linspace(0, steps * env.dt, steps)
        fig, axs = plt.subplots(2, 1, figsize=(12, 5))
        axs[0].plot(t, vxs, color="black", linestyle="-", label="Measured")
        axs[0].plot(t, np.full(steps, cmd[0]), color="black",
                    linestyle="--", label="Desired")
        axs[0].legend()
        axs[0].set_title("Forward Linear Velocity")
        axs[0].set_xlabel("Time (s)")
        axs[0].set_ylabel("Velocity (m/s)")
        axs[1].plot(t, qs, linestyle="-")
        axs[1].set_title("Joint Positions")
        axs[1].set_xlabel("Time (s)")
        axs[1].set_ylabel("Joint Position (rad)")
        plt.tight_layout()
        out = plot_path or os.path.join(
            os.path.dirname(policy_path) or ".", "play_rollout.png")
        plt.savefig(out, dpi=120)
        print(f"saved rollout figure to {out}")
    return vxs


def main():

    p = argparse.ArgumentParser()
    p.add_argument("--policy", type=str,
                   default="runs/latest/checkpoints/policy_latest.npz")
    p.add_argument("--steps", type=int, default=250)
    p.add_argument("--plot", action="store_true",
                   help="save the reference play.py velocity/joint figure")
    p.add_argument("--plot-path", type=str, default=None)
    p.add_argument("--video", type=str, default=None, metavar="PATH",
                   help="render the rollout to a skeleton video "
                        "(.mp4/.gif) — the offline replay-to-video analog "
                        "of the reference's IsaacGym viewer/camera capture")
    a = p.parse_args()
    play_go1(a.policy, a.steps, plot=a.plot, plot_path=a.plot_path,
             video_path=a.video)


if __name__ == "__main__":
    main()
