"""Training driver.

TPU-native rebuild of the reference Runner (reference:
go1_gym_learn/ppo_cse/__init__.py:62-308).  The per-iteration work —
24-step rollout + GAE + PPO + adaptation update — is one jitted device
program from learn/ppo.py; this host loop only dispatches iterations,
drains on-device logging accumulators at log_freq, checkpoints, and exports
the deployable policy (adaptation module + actor body as flat .npz weight
artifacts — the analog of the reference's TorchScript exports,
ppo_cse/__init__.py:240-251, consumed by play/deploy).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import curriculum as curr
from ..utils import checkpoint as ckpt
from ..utils.metrics_logger import MetricsLogger
from . import ppo as ppo_mod


@dataclasses.dataclass(frozen=True)
class RunnerArgs:
    """reference ppo_cse/__init__.py:43-59"""
    num_steps_per_env: int = 24
    max_iterations: int = 1500
    save_interval: int = 400
    log_freq: int = 10
    resume: bool = False
    # *.pkl = local pickle; a directory = shared-storage orbax checkpoint
    resume_path: Optional[str] = None
    # if set, every save_interval also commits the full train state to
    # this shared-storage directory (orbax; multi-host safe) so any host
    # of a pod slice — or a fresh cluster — can resume from it
    shared_ckpt_dir: Optional[str] = None
    # curriculum weight-grid + per-bin reward-mean dump cadence (reference
    # curriculum_dump_freq=500, ppo_cse/__init__.py:107,193-202)
    curriculum_dump_freq: int = 500
    # eval envs act with the teacher instead of the deterministic student
    # (reference learn(eval_expert=...), ppo_cse/__init__.py:107,140-147)
    eval_expert: bool = False
    # render a short student-policy rollout every N iterations (0 = off);
    # analog of the reference's save_video_interval camera capture
    render_interval: int = 0
    render_steps: int = 100


class Runner:
    def __init__(self, env, log_dir: str = "./runs/latest", seed: int = 1,
                 args: RunnerArgs = RunnerArgs(),
                 ppo_args: ppo_mod.PPO_Args = ppo_mod.PPO_Args(),
                 algo: str = "cse", mesh=None):
        """algo: 'cse' (concurrent state estimation, the default trainer,
        reference ppo_cse/) or 'rma' (teacher-student with env-factor
        encoder, reference ppo/).  Both variants emit the same IterMetrics
        so logging/checkpoint/export below are shared.

        mesh: optional jax.sharding.Mesh with an 'env' axis — env state is
        sharded on it and learner state replicated; GSPMD inserts the
        collectives (parallel/mesh.py).  num_envs must divide the axis."""
        self.env = env
        self.mesh = mesh
        self.args = args
        self.ppo_args = ppo_args
        self.algo = algo
        if algo == "cse":
            self._algo_mod = ppo_mod
        elif algo == "rma":
            from . import ppo_rma
            self._algo_mod = ppo_rma
        else:
            raise ValueError(f"unknown algo {algo!r} (want 'cse' or 'rma')")
        self.log_dir = log_dir
        self.logger = MetricsLogger(log_dir)
        self._write_chart_spec()
        self._write_provenance(seed)

        rng = jax.random.PRNGKey(seed)
        k_ts, self._reset_key = jax.random.split(rng)
        self.train_state = self._algo_mod.init_train_state(k_ts, env, ppo_args)
        self.train_iter = jax.jit(self._algo_mod.make_train_iteration(
            env, ppo_args, num_steps=args.num_steps_per_env,
            eval_expert=args.eval_expert))
        self.env_state = None
        self.obs_dict = None
        self.tot_timesteps = 0

        if args.resume and args.resume_path:
            self.load(args.resume_path)

    def learn(self, num_learning_iterations: Optional[int] = None,
              init_at_random_ep_len: bool = True):
        n_iters = num_learning_iterations or self.args.max_iterations
        if self.env_state is None:
            self.env_state, self.obs_dict = self.env.reset(
                self._reset_key, random_episode_lengths=init_at_random_ep_len)
            if self.mesh is not None:
                from ..parallel import mesh as mesh_mod
                self.env_state = mesh_mod.shard_env_state(
                    self.env_state, self.mesh, self.env.num_envs)
                self.obs_dict = mesh_mod.shard_env_state(
                    self.obs_dict, self.mesh, self.env.num_envs)
                self.train_state = mesh_mod.replicate(
                    self.train_state, self.mesh)

        term_names = list(self.env.reward_names) + ["total"]
        ep_sums_acc = np.zeros(len(term_names))
        ep_count_acc = 0.0
        ep_len_acc = 0.0
        ev_sums_acc = np.zeros(len(term_names))
        ev_count_acc = 0.0
        ev_len_acc = 0.0
        env_exit_acc = 0.0       # cumulative crash-guard terminations
        t_start = time.time()

        start_iter = int(self.train_state.iteration)
        pending = []     # device metric futures; drained at log_freq only —
        # fetching per-iteration would synchronize the async dispatch queue
        t_window = time.time()
        for it in range(start_iter, start_iter + n_iters):
            self.env_state, self.obs_dict, self.train_state, metrics = \
                self.train_iter(self.env_state, self.obs_dict, self.train_state)
            pending.append(metrics)
            self.tot_timesteps += self.args.num_steps_per_env * self.env.num_envs

            if (it + 1) % self.args.log_freq == 0:
                iter_time = (time.time() - t_window) / max(len(pending), 1)
                t_window = time.time()
                for m in jax.device_get(pending):
                    ep_sums_acc += m.ep_sums_done
                    ep_count_acc += float(m.ep_count_done)
                    ep_len_acc += float(m.ep_len_done)
                    ev_sums_acc += m.eval_ep_sums_done
                    ev_count_acc += float(m.eval_ep_count_done)
                    ev_len_acc += float(m.eval_ep_len_done)
                    env_exit_acc += float(m.envelope_exits)
                    self.logger.store(
                        mean_value_loss=m.value_loss,
                        mean_surrogate_loss=m.surrogate_loss,
                        adaptation_loss=m.adaptation_loss,
                        mean_adaptation_module_test_loss=m.adaptation_test_loss,
                        mean_kl=m.mean_kl, lr=m.lr,
                        mean_reward_per_step=m.mean_reward,
                        time_iter=iter_time,
                    )
                    for c, name in enumerate(curr.CATEGORY_NAMES):
                        self.logger.store(**{f"command_area_{name}":
                                             float(m.curriculum_area[c])})
                pending = []
                extra = {"iterations": it + 1, "timesteps": self.tot_timesteps,
                         # cumulative count of integrator-envelope crash
                         # terminations (healthy runs stay at 0; the r4
                         # seed-2 signature would show here immediately)
                         "train/episode/envelope_exits_total": env_exit_acc}
                # command/action range diagnostics at the same sync point
                # (reference legged_robot.py:203-227 logs min/max of each
                # command channel and of the actions every episode-log)
                n_tr = self.env.num_train_envs
                cmds = np.asarray(self.env_state.commands[:n_tr])
                acts = np.asarray(self.env_state.actions[:n_tr])
                for key, col in (("duration", 8), ("bound", 7),
                                 ("offset", 6), ("phase", 5), ("freq", 4),
                                 ("x_vel", 0), ("y_vel", 1), ("yaw_vel", 2),
                                 ("swing_height", 9)):
                    extra[f"train/episode/min_command_{key}"] = \
                        float(cmds[:, col].min())
                    extra[f"train/episode/max_command_{key}"] = \
                        float(cmds[:, col].max())
                extra["train/episode/min_action"] = float(acts.min())
                extra["train/episode/max_action"] = float(acts.max())
                if ep_count_acc > 0:
                    for i, name in enumerate(term_names):
                        extra[f"train/episode/rew_{name}/mean"] = (
                            ep_sums_acc[i] / ep_count_acc)
                    extra["train/episode/mean_episode_length"] = (
                        ep_len_acc / ep_count_acc)
                if ev_count_acc > 0:
                    for i, name in enumerate(term_names):
                        extra[f"eval/episode/rew_{name}/mean"] = (
                            ev_sums_acc[i] / ev_count_acc)
                    extra["eval/episode/mean_episode_length"] = (
                        ev_len_acc / ev_count_acc)
                ep_sums_acc[:] = 0.0
                ep_count_acc = 0.0
                ep_len_acc = 0.0
                ev_sums_acc[:] = 0.0
                ev_count_acc = 0.0
                ev_len_acc = 0.0
                row = self.logger.summary(**extra)
                steps_s = self.tot_timesteps / max(time.time() - t_start, 1e-9)
                print(f"it {it+1:5d} | rew/step "
                      f"{row.get('mean_reward_per_step', 0):.4f} | "
                      f"vloss {row.get('mean_value_loss', 0):.3f} | "
                      f"aloss {row.get('adaptation_loss', 0):.5f} | "
                      f"env-steps/s {steps_s:,.0f}", flush=True)

            if (it + 1) % self.args.curriculum_dump_freq == 0:
                self.dump_curriculum(it + 1)

            if (it + 1) % self.args.save_interval == 0:
                self.save(os.path.join(self.log_dir, "checkpoints",
                                       f"train_state_{it+1:06d}.pkl"))
                self.export_policy(os.path.join(self.log_dir, "checkpoints"))
                if self.args.shared_ckpt_dir:
                    self.save(self.args.shared_ckpt_dir)

            if (self.args.render_interval
                    and (it + 1) % self.args.render_interval == 0):
                self.log_video(it + 1)

        self.save(os.path.join(self.log_dir, "checkpoints",
                               "train_state_last.pkl"))
        self.export_policy(os.path.join(self.log_dir, "checkpoints"))
        if self.args.shared_ckpt_dir:
            self.save(self.args.shared_ckpt_dir)
        return self.train_state

    def _write_provenance(self, seed: int):
        """Stamp the run dir with everything needed to reproduce it: git
        SHA (+dirty flag), a stable hash of the resolved env config, the
        resolved SimParams, runner/ppo args, argv, the jax backend, and
        the machine-load context (loadavg + other live python processes)
        so throughput anomalies are explicable from the artifact alone.
        Every results table cites runs; this records which code revision
        each run actually measured.

        Dirty-tree runs are loudly warned about (results are then not
        reproducible from any SHA); flagship runs should set
        WTW_REQUIRE_CLEAN=1, which turns the warning into a hard error."""
        import hashlib
        import json
        import subprocess
        import sys
        from datetime import datetime

        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        sha, dirty = None, None
        try:
            sha = subprocess.run(
                ["git", "rev-parse", "HEAD"], cwd=repo, capture_output=True,
                text=True, timeout=10).stdout.strip() or None
            dirty = bool(subprocess.run(
                ["git", "status", "--porcelain", "--untracked-files=no"],
                cwd=repo, capture_output=True, text=True,
                timeout=10).stdout.strip())
        except Exception:
            pass
        if dirty or (dirty is None and os.environ.get("WTW_REQUIRE_CLEAN")):
            # dirty is None when git itself failed (no binary / not a repo /
            # timeout) — under WTW_REQUIRE_CLEAN that must ALSO refuse, or
            # the gate would be silently bypassed exactly when provenance
            # is unknowable
            msg = ("PROVENANCE: the git tree is DIRTY - this run cannot be "
                   "reproduced from any committed SHA.  Commit first (or "
                   "accept a provenance.json with git_dirty=true)."
                   if dirty else
                   "PROVENANCE: git state could not be determined (no git "
                   "binary / not a repository?) - provenance is unknowable.")
            if os.environ.get("WTW_REQUIRE_CLEAN"):
                raise RuntimeError(msg + "  (WTW_REQUIRE_CLEAN is set)")
            print(f"\n{'!' * 72}\n{msg}\n{'!' * 72}\n",
                  file=sys.stderr, flush=True)
        # machine-load context: loadavg and concurrently running python
        # processes at launch, so a halved cumulative env-steps/s (e.g.
        # test-suite contention on the same box) is visible in the artifact
        loadavg = None
        try:
            loadavg = list(os.getloadavg())
        except OSError:
            pass
        other_procs = []
        try:
            out = subprocess.run(
                ["ps", "-eo", "pid,pcpu,comm,args", "--no-headers"],
                capture_output=True, text=True, timeout=10).stdout
            me = os.getpid()
            for line in out.splitlines():
                parts = line.split(None, 3)
                if len(parts) < 4 or int(parts[0]) == me:
                    continue
                if "python" in parts[2] or "pytest" in parts[2]:
                    other_procs.append(
                        {"pid": int(parts[0]), "pcpu": float(parts[1]),
                         "cmd": parts[3][:160]})
        except Exception:
            pass
        cfg_json = json.dumps(dataclasses.asdict(self.env.cfg),
                              sort_keys=True, default=str)
        info = {
            "time": datetime.now().isoformat(timespec="seconds"),
            "argv": sys.argv,
            "git_sha": sha,
            "git_dirty": dirty,
            "seed": seed,
            "algo": self.algo,
            "num_envs": self.env.num_envs,
            "backend": jax.default_backend(),
            "loadavg": loadavg,
            "ncpu": os.cpu_count(),
            "other_python_procs": other_procs,
            "config_hash": hashlib.sha256(
                cfg_json.encode()).hexdigest()[:12],
            "sim_params": dataclasses.asdict(self.env.sim_params),
            "runner_args": dataclasses.asdict(self.args),
            "ppo_args": dataclasses.asdict(self.ppo_args),
        }
        os.makedirs(self.log_dir, exist_ok=True)
        with open(os.path.join(self.log_dir, "provenance.json"), "w") as f:
            json.dump(info, f, indent=1, default=str)

    def _write_chart_spec(self):
        """Dashboard chart spec in the run dir (the reference writes
        .charts.yml for ml_dash, scripts/train.py:227-253; here any
        plotting frontend can consume it against metrics.jsonl)."""
        keys = ["train/episode/rew_total/mean",
                "train/episode/rew_tracking_lin_vel/mean",
                "train/episode/rew_tracking_contacts_shaped_force/mean",
                "train/episode/rew_action_smoothness_1/mean",
                "train/episode/rew_action_smoothness_2/mean",
                "train/episode/rew_tracking_contacts_shaped_vel/mean",
                "train/episode/rew_orientation_control/mean",
                "train/episode/rew_dof_pos/mean",
                "command_area_trot",
                "train/episode/mean_episode_length",
                "adaptation_loss"]
        lines = ["charts:"]
        for k in keys:
            lines += [f"- yKey: {k}", "  xKey: iterations"]
        lines += ["- type: video", '  glob: "videos/*.gif"', ""]
        os.makedirs(self.log_dir, exist_ok=True)
        with open(os.path.join(self.log_dir, ".charts.yml"), "w") as f:
            f.write("\n".join(lines))

    def dump_curriculum(self, it: int):
        """Dump the curriculum weight grids and per-bin episode task-reward
        means (window since the previous dump) — the TPU-native analog of
        the reference's curriculum/distribution.pkl + curriculum/info.pkl
        appends (ppo_cse/__init__.py:193-202, legged_robot.py:229-232).
        The accumulators live on device as monotonic sums inside
        CurriculumState; this drains deltas so the hot loop never resets
        them."""
        cur = jax.device_get(self.env_state.curriculum)
        if not hasattr(self, "_prev_bin_sums"):
            self._prev_bin_sums = np.zeros_like(cur.bin_task_sums)
            self._prev_bin_counts = np.zeros_like(cur.bin_ep_counts)
        d_sums = cur.bin_task_sums - self._prev_bin_sums
        d_counts = cur.bin_ep_counts - self._prev_bin_counts
        self._prev_bin_sums = np.asarray(cur.bin_task_sums)
        self._prev_bin_counts = np.asarray(cur.bin_ep_counts)
        means = d_sums / np.maximum(d_counts, 1.0)[..., None]
        out_dir = os.path.join(self.log_dir, "curriculum")
        os.makedirs(out_dir, exist_ok=True)
        np.savez(
            os.path.join(out_dir, f"distribution_{it:06d}.npz"),
            iteration=np.asarray(it),
            weights=np.asarray(cur.weights),
            grid=self.env.curr_grid.grid,
            bin_task_reward_means=means,
            bin_episode_counts=d_counts,
            task_keys=np.asarray(curr.TASK_KEYS),
            categories=np.asarray(curr.CATEGORY_NAMES),
        )

    def log_video(self, it: int):
        """Render env 0 of the live training env under the current student
        policy for render_steps control steps (reference log_video,
        ppo_cse/__init__.py:277-296).  Uses a throwaway copy of the env
        state so training statistics are unaffected."""
        from ..models import actor_critic as ac
        from ..utils.render import render_trajectory

        state, obs = self.env_state, self.obs_dict
        if self.algo == "rma":
            from . import ppo_rma
            pol = jax.jit(lambda p, o: ppo_rma.student_mean(
                p, o["obs"], o["obs_history"]))
        else:
            pol = jax.jit(lambda p, o: ac.actor_mean(p, o["obs_history"]))
        step = jax.jit(self.env.step)
        frames = []
        for _ in range(self.args.render_steps):
            actions = pol(self.train_state.params, obs)
            state, obs, rew, done, info = step(state, actions)
            frames.append(jax.tree.map(
                lambda x: np.asarray(x[0:1]), state.phys))
        out_dir = os.path.join(self.log_dir, "videos")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{it:05d}.gif")
        render_trajectory(self.env.model, frames, path,
                          fps=int(1 / self.env.dt), stride=2)
        print(f"saved video {path}", flush=True)

    # -- persistence ------------------------------------------------------
    # Path convention: *.pkl = local single-host pickle (dependency-light
    # default); anything else = a shared-storage DIRECTORY in the orbax
    # format (utils/checkpoint.save_shared) — multi-host safe (each
    # process writes/reads its own shards) and usable as a common resume
    # point for a pod slice, the analog of the reference Runner's
    # ml_logger server resume (ppo_cse/__init__.py:76-91).
    def save(self, path: str):
        tree = {
            "train_state": self.train_state,
            "env_state": self.env_state,
            "obs_dict": self.obs_dict,
        }
        if path.endswith(".pkl"):
            ckpt.save(path, tree)
        else:
            ckpt.save_shared(path, tree)

    def load(self, path: str):
        if self.env_state is None:
            self.env_state, self.obs_dict = self.env.reset(self._reset_key)
            if self.mesh is not None and not path.endswith(".pkl"):
                # orbax restores UNDER the template shardings, so build
                # sharded templates first; the pickle branch rebuilds
                # leaves with plain jnp.asarray (GSPMD re-shards lazily
                # on first use), so sharding templates would be dead work
                from ..parallel import mesh as mesh_mod
                self.env_state = mesh_mod.shard_env_state(
                    self.env_state, self.mesh, self.env.num_envs)
                self.obs_dict = mesh_mod.shard_env_state(
                    self.obs_dict, self.mesh, self.env.num_envs)
                self.train_state = mesh_mod.replicate(
                    self.train_state, self.mesh)
        if path.endswith(".pkl"):
            loaded = ckpt.load(path)
            self.train_state = ckpt.restore_like(
                self.train_state, loaded["train_state"])
            self.env_state = ckpt.restore_like(
                self.env_state, loaded["env_state"])
            self.obs_dict = {
                k: jnp.asarray(v) for k, v in loaded["obs_dict"].items()}
        else:
            loaded = ckpt.load_shared(path, {
                "train_state": self.train_state,
                "env_state": self.env_state,
                "obs_dict": self.obs_dict,
            })
            self.train_state = loaded["train_state"]
            self.env_state = loaded["env_state"]
            self.obs_dict = loaded["obs_dict"]

    def export_policy(self, dirpath: str):
        """Deployment artifact: flat npz of adaptation + actor weights
        (the analog of {adaptation_module,body}_latest.jit,
        ppo_cse/__init__.py:240-251).

        meta/variant records the actor input wiring — 'cse': actor(history
        + latent); 'rma': actor(obs + latent) (reference ppo/actor_critic
        .py:38-56).  Loaders missing the key assume 'cse' (pre-round-2
        artifacts)."""
        os.makedirs(dirpath, exist_ok=True)
        p = self.train_state.params
        flat = {"meta/variant": np.asarray(self.algo)}
        for i, (w, b) in enumerate(zip(p.adaptation.weights, p.adaptation.biases)):
            flat[f"adaptation/w{i}"] = np.asarray(w)
            flat[f"adaptation/b{i}"] = np.asarray(b)
        for i, (w, b) in enumerate(zip(p.actor.weights, p.actor.biases)):
            flat[f"actor/w{i}"] = np.asarray(w)
            flat[f"actor/b{i}"] = np.asarray(b)
        flat["meta/n_adaptation"] = np.asarray(len(p.adaptation.weights))
        flat["meta/n_actor"] = np.asarray(len(p.actor.weights))
        flat["std"] = np.asarray(p.std)
        np.savez(os.path.join(dirpath, "policy_latest.npz"), **flat)
