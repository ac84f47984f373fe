"""Offline trajectory renderer (video logging).

The reference records per-env-0 camera videos through IsaacGym's renderer
(reference: go1_gym/envs/base/legged_robot.py:1592-1673 `_render_headless`,
go1_gym_learn/ppo_cse/__init__.py:277-296 `log_video`).  There is no GPU
renderer here; instead we draw the robot skeleton (trunk box + leg chains +
feet) from recorded PhysicsStates with matplotlib and encode a video with
imageio — good enough for qualitative gait inspection in dashboards.

Usage:
    frames = [state_t.phys for each control step]   # host-side ring buffer
    render_trajectory(model, frames, "rollout.mp4", fps=50)
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def _skeleton_points(model, phys, env_idx: int = 0):
    """Joint-chain world positions for one env from a PhysicsState."""
    import jax.numpy as jnp
    from ..physics import engine as eng

    frames = eng.forward_kinematics(model, type(phys)(
        *[jnp.asarray(np.asarray(x)[env_idx:env_idx + 1]) for x in phys]))
    p = np.asarray(frames.p[0])          # (nb, 3) joint origins
    R = np.asarray(frames.R[0])
    feet = p[model.foot_body] + np.einsum(
        "fij,fj->fi", R[model.foot_body], model.foot_offset)
    return p, feet


def render_trajectory(model, phys_states: Sequence, out_path: str,
                      fps: int = 50, env_idx: int = 0, stride: int = 1):
    """Render a list of PhysicsStates to a video file (.mp4/.gif)."""
    import imageio
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    imgs: List[np.ndarray] = []
    for t in range(0, len(phys_states), stride):
        phys = phys_states[t]
        p, feet = _skeleton_points(model, phys, env_idx)
        base = p[0]
        fig = plt.figure(figsize=(6, 4), dpi=90)
        ax = fig.add_subplot(111, projection="3d")
        # trunk box outline
        hx, hy, hz = 0.3762 / 2, 0.0935 / 2, 0.114 / 2
        # leg chains: base -> hip -> thigh -> calf -> foot
        for l in range(4):
            hip, thigh, calf = 1 + 3 * l, 2 + 3 * l, 3 + 3 * l
            xs = [base[0], p[hip][0], p[thigh][0], p[calf][0], feet[l][0]]
            ys = [base[1], p[hip][1], p[thigh][1], p[calf][1], feet[l][1]]
            zs = [base[2], p[hip][2], p[thigh][2], p[calf][2], feet[l][2]]
            ax.plot(xs, ys, zs, "-o", markersize=2.5, linewidth=1.5)
        ax.scatter(*base, s=40, c="k")
        # ground plane reference
        gx = np.linspace(base[0] - 0.6, base[0] + 0.6, 2)
        gy = np.linspace(base[1] - 0.6, base[1] + 0.6, 2)
        GX, GY = np.meshgrid(gx, gy)
        ax.plot_surface(GX, GY, np.zeros_like(GX), alpha=0.15, color="gray")
        ax.set_xlim(base[0] - 0.6, base[0] + 0.6)
        ax.set_ylim(base[1] - 0.6, base[1] + 0.6)
        ax.set_zlim(0, 0.8)
        ax.set_box_aspect((1, 1, 0.66))
        ax.view_init(elev=12, azim=-60)
        ax.set_axis_off()
        fig.tight_layout(pad=0)
        fig.canvas.draw()
        img = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        imgs.append(img)
        plt.close(fig)
    imageio.mimsave(out_path, imgs, fps=fps // stride)
    return out_path
