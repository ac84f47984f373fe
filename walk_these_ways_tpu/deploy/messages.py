"""Deployment wire messages.

Rebuild of the reference's LCM IDL types (reference: go1_gym_deploy/
lcm_types/*.lcm — leg_control_data_lcmt, pd_tau_targets_lcmt,
rc_command_lcmt, state_estimator_lcmt) as fixed-layout little-endian
structs.  The reference generates Python/C++ bindings from LCM IDL; we use
explicit struct packing shared by the Python agent (this module) and the
C++ bridge (deploy/cpp/wire.h) — same fields, same channels, no codegen.

All floats are f32, ints i32/i8; layouts are packed (no padding).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import ClassVar, List

CHANNEL_LEG_CONTROL = "leg_control_data"
CHANNEL_STATE_ESTIMATOR = "state_estimator_data"
CHANNEL_RC_COMMAND = "rc_command"
CHANNEL_PD_TARGETS = "pd_plustau_targets"


def _pack_floats(vals):
    return struct.pack(f"<{len(vals)}f", *vals)


@dataclass
class LegControlData:
    """q/qd/tau per joint (reference leg_control_data_lcmt)."""
    FMT: ClassVar[str] = "<36f"
    q: List[float] = field(default_factory=lambda: [0.0] * 12)
    qd: List[float] = field(default_factory=lambda: [0.0] * 12)
    tau_est: List[float] = field(default_factory=lambda: [0.0] * 12)

    def encode(self) -> bytes:
        return struct.pack(self.FMT, *self.q, *self.qd, *self.tau_est)

    @classmethod
    def decode(cls, data: bytes) -> "LegControlData":
        v = struct.unpack(cls.FMT, data[: struct.calcsize(cls.FMT)])
        return cls(q=list(v[0:12]), qd=list(v[12:24]), tau_est=list(v[24:36]))


@dataclass
class PdTauTargets:
    """PD targets + feedforward torque (reference pd_tau_targets_lcmt)."""
    FMT: ClassVar[str] = "<60f i"
    q_des: List[float] = field(default_factory=lambda: [0.0] * 12)
    qd_des: List[float] = field(default_factory=lambda: [0.0] * 12)
    kp: List[float] = field(default_factory=lambda: [0.0] * 12)
    kd: List[float] = field(default_factory=lambda: [0.0] * 12)
    tau_ff: List[float] = field(default_factory=lambda: [0.0] * 12)
    id: int = 0

    def encode(self) -> bytes:
        return struct.pack(self.FMT, *self.q_des, *self.qd_des, *self.kp,
                           *self.kd, *self.tau_ff, self.id)

    @classmethod
    def decode(cls, data: bytes) -> "PdTauTargets":
        v = struct.unpack(cls.FMT, data[: struct.calcsize(cls.FMT)])
        return cls(q_des=list(v[0:12]), qd_des=list(v[12:24]),
                   kp=list(v[24:36]), kd=list(v[36:48]),
                   tau_ff=list(v[48:60]), id=v[60])


@dataclass
class RcCommand:
    """Joystick state (reference rc_command_lcmt)."""
    FMT: ClassVar[str] = "<5f 5i"
    left_stick_x: float = 0.0
    left_stick_y: float = 0.0
    right_stick_x: float = 0.0
    right_stick_y: float = 0.0
    knob: float = 0.0
    mode: int = 0
    left_upper_switch: int = 0
    left_lower_left_switch: int = 0
    right_upper_switch: int = 0
    right_lower_right_switch: int = 0

    def encode(self) -> bytes:
        return struct.pack(
            self.FMT, self.left_stick_x, self.left_stick_y,
            self.right_stick_x, self.right_stick_y, self.knob, self.mode,
            self.left_upper_switch, self.left_lower_left_switch,
            self.right_upper_switch, self.right_lower_right_switch)

    @classmethod
    def decode(cls, data: bytes) -> "RcCommand":
        v = struct.unpack(cls.FMT, data[: struct.calcsize(cls.FMT)])
        return cls(*v)


@dataclass
class StateEstimate:
    """IMU + estimator output (reference state_estimator_lcmt)."""
    FMT: ClassVar[str] = "<3f 3f 3f 3f 4f 3f 4f"
    p: List[float] = field(default_factory=lambda: [0.0] * 3)
    vWorld: List[float] = field(default_factory=lambda: [0.0] * 3)
    rpy: List[float] = field(default_factory=lambda: [0.0] * 3)
    omegaBody: List[float] = field(default_factory=lambda: [0.0] * 3)
    quat: List[float] = field(default_factory=lambda: [1.0, 0.0, 0.0, 0.0])
    aBody: List[float] = field(default_factory=lambda: [0.0] * 3)
    contact_estimate: List[float] = field(default_factory=lambda: [0.0] * 4)

    def encode(self) -> bytes:
        return struct.pack(self.FMT, *self.p, *self.vWorld, *self.rpy,
                           *self.omegaBody, *self.quat, *self.aBody,
                           *self.contact_estimate)

    @classmethod
    def decode(cls, data: bytes) -> "StateEstimate":
        v = struct.unpack(cls.FMT, data[: struct.calcsize(cls.FMT)])
        return cls(p=list(v[0:3]), vWorld=list(v[3:6]), rpy=list(v[6:9]),
                   omegaBody=list(v[9:12]), quat=list(v[12:16]),
                   aBody=list(v[16:19]), contact_estimate=list(v[19:23]))
