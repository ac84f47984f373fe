"""Reproduce the seed-2 iter-~3780 blowup from the 3600 checkpoint.

Bit-exact resume: run the same jitted train iteration and watch for envs
whose base z leaves the plausible band.  On first trigger, dump the env
state before and after the offending iteration for offline analysis.
"""
import os, sys, pickle
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from walk_these_ways_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from walk_these_ways_tpu.go1_config import mob_train_cfg
from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
from walk_these_ways_tpu.learn.runner import Runner, RunnerArgs

CKPT = "runs/benchmark_curve_r4/seed2/checkpoints/train_state_003600.pkl"
os.chdir("/root/repo")

cfg = mob_train_cfg(num_envs=4000)
env = LeggedRobotEnv(cfg)
runner = Runner(env, log_dir="/tmp/repro_seed2_logs", seed=2,
                args=RunnerArgs(max_iterations=400, resume=True,
                                resume_path=CKPT))
runner.env_state, runner.obs_dict = None, None
runner.load(CKPT)

es, od, ts = runner.env_state, runner.obs_dict, runner.train_state
print("resumed at iteration", int(ts.iteration), flush=True)

prev = None
for it in range(int(ts.iteration), 4000):
    prev_es = es
    es, od, ts, metrics = runner.train_iter(es, od, ts)
    z = np.asarray(es.phys.base_pos[:, 2])
    v = np.asarray(es.phys.base_lin_vel)
    speed = np.linalg.norm(v, axis=1)
    zmax, vmax = z.max(), speed.max()
    nbad = int((np.abs(z - 0.34) > 1.0).sum())
    if (it + 1) % 10 == 0 or nbad > 0:
        print(f"it {it+1}: zmax {zmax:8.3f} zmin {z.min():8.3f} "
              f"vmax {vmax:8.2f} nbad {nbad}", flush=True)
    if nbad > 0:
        i = int(np.abs(z - 0.34).argmax())
        print("FIRST BAD ENV:", i, "z=", z[i], "v=", v[i], flush=True)
        with open("/tmp/blowup_state.pkl", "wb") as f:
            pickle.dump({
                "it": it + 1, "env": i,
                "prev": jax.tree.map(np.asarray, prev_es),
                "cur": jax.tree.map(np.asarray, es),
            }, f)
        print("dumped /tmp/blowup_state.pkl", flush=True)
        break
