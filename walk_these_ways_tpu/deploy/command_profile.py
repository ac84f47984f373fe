"""Command sources for deployment.

Rebuild of the reference CommandProfile family (reference:
go1_gym_deploy/utils/command_profile.py:4-231): time-indexed profiles,
constant commands, and the RC-controller profile that reads the joystick
through the state estimator.  Commands are the 15-dim vector
[vx, vy, vyaw, height, freq, phase, offset, bound, duration, footswing,
pitch, roll, stance_width, stance_length, aux].
"""
from __future__ import annotations

import numpy as np


class CommandProfile:
    def __init__(self, dt, max_time_s=10.0):
        self.dt = dt
        self.max_timestep = int(max_time_s / dt)
        self.commands = np.zeros((self.max_timestep, 15))

    def get_command(self, t):
        timestep = int(min(t / self.dt, self.max_timestep - 1))
        return self.commands[timestep], False


class ConstantAccelerationProfile(CommandProfile):
    """reference command_profile.py:24-36"""

    def __init__(self, dt, max_speed, accel_time, zero_buffer_time=0.0):
        super().__init__(dt)
        zero_buffer = int(zero_buffer_time / dt)
        accel_steps = int(accel_time / dt)
        t = np.arange(self.max_timestep - zero_buffer) * dt
        v = np.minimum(t / accel_time * max_speed, max_speed)
        self.commands[zero_buffer:, 0] = v


class ConstantGaitProfile(CommandProfile):
    """Fixed gait + velocity command (the play.py eval protocol)."""

    def __init__(self, dt, vx=1.5, gait=(0.5, 0.0, 0.0), freq=3.0,
                 footswing=0.08, stance_width=0.25, duration=0.5):
        super().__init__(dt)
        self.commands[:, 0] = vx
        self.commands[:, 4] = freq
        self.commands[:, 5:8] = np.asarray(gait)
        self.commands[:, 8] = duration
        self.commands[:, 9] = footswing
        self.commands[:, 12] = stance_width


class RCControllerProfile:
    """Joystick-driven commands (reference command_profile.py:97-176)."""

    def __init__(self, dt, state_estimator, x_scale=1.0, y_scale=1.0,
                 yaw_scale=1.0):
        self.dt = dt
        self.se = state_estimator
        self.x_scale = x_scale
        self.y_scale = y_scale
        self.yaw_scale = yaw_scale
        self.triggered_commands = {i: None for i in range(4)}
        self.currently_triggered = {i: 0 for i in range(4)}
        self.button_states = np.zeros(4)

    def register_triggered_command(self, button_idx, command_profile):
        self.triggered_commands[button_idx] = command_profile

    def get_command(self, t, probe=False):
        cmd = self.se.get_command()
        cmd = np.asarray(cmd, dtype=np.float64).copy()
        cmd[0] *= self.x_scale
        cmd[1] *= self.y_scale
        cmd[2] *= self.yaw_scale
        reset_timer = False
        # button-triggered profiles (command_profile.py:133-160)
        buttons = self.se.get_buttons()
        for i in range(4):
            if buttons[i] and self.button_states[i] == 0:
                if self.triggered_commands[i] is not None:
                    self.currently_triggered[i] = not self.currently_triggered[i]
                    reset_timer = True
            self.button_states[i] = buttons[i]
        for i in range(4):
            if self.currently_triggered[i] and self.triggered_commands[i] is not None:
                cmd, _ = self.triggered_commands[i].get_command(t)
        return cmd[:15], reset_timer


class KeyboardCommandProfile:
    """Constant command adjustable programmatically (keyboard analog,
    reference command_profile.py:179-226)."""

    def __init__(self, dt):
        self.dt = dt
        self.command = np.zeros(15)
        self.command[4] = 3.0
        self.command[5] = 0.5
        self.command[8] = 0.5
        self.command[9] = 0.08
        self.command[12] = 0.33
        self.command[13] = 0.40

    def set(self, **kw):
        idx = dict(vx=0, vy=1, vyaw=2, height=3, freq=4, phase=5, offset=6,
                   bound=7, duration=8, footswing=9, pitch=10, roll=11,
                   stance_width=12, stance_length=13)
        for k, v in kw.items():
            self.command[idx[k]] = v

    def get_command(self, t):
        return self.command.copy(), False
