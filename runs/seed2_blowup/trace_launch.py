"""Per-control-step trace of env 194 during iteration 3664 (the launch)."""
import os, sys, pickle
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from walk_these_ways_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from walk_these_ways_tpu.go1_config import mob_train_cfg
from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
from walk_these_ways_tpu.learn.runner import Runner, RunnerArgs
from walk_these_ways_tpu.models import actor_critic as ac

CKPT = "runs/benchmark_curve_r4/seed2/checkpoints/train_state_003600.pkl"
os.chdir("/root/repo")
I = 194

cfg = mob_train_cfg(num_envs=4000)
env = LeggedRobotEnv(cfg)
runner = Runner(env, log_dir="/tmp/repro_seed2_logs", seed=2,
                args=RunnerArgs(max_iterations=400, resume=True,
                                resume_path=CKPT))
runner.env_state, runner.obs_dict = None, None
runner.load(CKPT)
es, od, ts = runner.env_state, runner.obs_dict, runner.train_state

for it in range(int(ts.iteration), 3663):
    es, od, ts, _ = runner.train_iter(es, od, ts)
print("at iteration", int(ts.iteration), flush=True)

# replicate train_iteration's rng chain for the rollout of iter 3664
# (ppo.py train_iteration: rng, k_roll, k_perm = split(ts.rng, 3);
#  rollout_step: rng, k_act = split(rng))
rng, k_roll, k_perm = jax.random.split(ts.rng, 3)
step = jax.jit(env.step)
sample = jax.jit(lambda p, h, k: ac.sample_actions(p, h, k))

r = k_roll
rows = []
for t in range(48):
    r, k_act = jax.random.split(r)
    hist = od["obs_history"]
    actions, _, _, _ = sample(ts.params, hist, k_act)
    es, od, rew, done, info = step(es, actions)
    ph = es.phys
    rec = dict(
        t=t,
        pos=np.asarray(ph.base_pos[I]), vel=np.asarray(ph.base_lin_vel[I]),
        ang=np.asarray(ph.base_ang_vel[I]), q=np.asarray(ph.q[I]),
        qd=np.asarray(ph.qd[I]), act=np.asarray(actions[I]),
        tq=np.asarray(es.torques[I]),
        cf=np.asarray(es.contact_forces[I]),
        footz=np.asarray(es.foot_positions[I][:, 2]),
        done=bool(np.asarray(done[I])),
        eplen=float(np.asarray(es.episode_length[I])),
        obsmax=float(np.abs(np.asarray(hist[I])).max()),
    )
    rows.append(rec)
    print(f"t{t:02d} ep{rec['eplen']:4.0f} done{int(rec['done'])} "
          f"z{rec['pos'][2]:7.3f} |v|{np.linalg.norm(rec['vel']):6.2f} "
          f"|w|{np.linalg.norm(rec['ang']):6.2f} qdmax{np.abs(rec['qd']).max():5.1f} "
          f"tqmax{np.abs(rec['tq']).max():6.1f} cfmax{np.abs(rec['cf']).max():8.1f} "
          f"footzmin{rec['footz'].min():7.3f} obsmax{rec['obsmax']:7.1f} "
          f"actmax{np.abs(rec['act']).max():5.1f}", flush=True)

with open("/tmp/launch_trace.pkl", "wb") as f:
    pickle.dump(rows, f)
print("saved /tmp/launch_trace.pkl", flush=True)
