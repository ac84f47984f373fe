"""Per-seed learning-curve statistics for the round-5 benchmark study.

Reads each seed's metrics.jsonl and reports the reference success
criterion (ref scripts/train.py:23-26 — tracking crosses the curriculum
threshold and the command area expands) plus episode health:
  - first curriculum expansion iteration (command_area_trot > its initial
    value, i.e. the x-vel range grew past the +-1 m/s starting box)
  - tracking_lin_vel episode reward at 2000/3000/4000
  - final mean episode length
Usage: python runs/benchmark_curve_r5/analyze.py [run_dir ...]
"""
import json
import sys


def analyze(run_dir):
    rows = [json.loads(l) for l in open(f"{run_dir}/metrics.jsonl")]
    area0 = None
    first_exp = None
    for r in rows:
        a = r.get("command_area_trot")
        if a is None:
            continue
        if area0 is None:
            area0 = a
        elif first_exp is None and a > area0 * 1.01:
            first_exp = r["iterations"]
    def at(it, key):
        best = None
        for r in rows:
            if r.get("iterations", 0) <= it and key in r:
                best = r[key]
        return best
    key = "train/episode/rew_tracking_lin_vel/mean"
    out = {
        "run": run_dir,
        "iters": rows[-1].get("iterations"),
        "first_curriculum_expansion": first_exp,
        "tracking@2000": at(2000, key),
        "tracking@3000": at(3000, key),
        "tracking@final": at(1e18, key),
        "final_ep_len": at(1e18, "train/episode/mean_episode_length"),
        "final_area_trot": at(1e18, "command_area_trot"),
    }
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    for d in sys.argv[1:]:
        analyze(d)
