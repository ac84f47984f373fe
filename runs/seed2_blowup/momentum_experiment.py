"""Free-flight momentum conservation test on the blown-up env-194 state.

In free flight (no contact), total linear momentum must satisfy
dP/dt = m_total * g exactly, for ANY internal (joint) torques.  Measure
the violation under: (a) exact substeps + qd clamp, (b) exact substeps,
clamp effectively off, (c) cached/reuse path + clamp, to identify what
injects momentum in the seed-2 blowup regime.
"""
import os, sys, pickle
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from walk_these_ways_tpu.models.robot import go1
from walk_these_ways_tpu.physics import engine as E

model = go1()
d = pickle.load(open("/tmp/blowup_state.pkl", "rb"))
prev = d["prev"]; i = d["env"]

N = 1
f32 = jnp.float32
state0 = E.PhysicsState(
    base_pos=jnp.asarray(prev.phys.base_pos[i][None]).astype(f32)
        .at[0, 2].set(50.0),                       # well above ground
    base_quat=jnp.asarray(prev.phys.base_quat[i][None]).astype(f32),
    base_lin_vel=jnp.asarray(prev.phys.base_lin_vel[i][None]).astype(f32),
    base_ang_vel=jnp.asarray(prev.phys.base_ang_vel[i][None]).astype(f32),
    q=jnp.asarray(prev.phys.q[i][None]).astype(f32),
    qd=jnp.asarray(prev.phys.qd[i][None]).astype(f32),
)
G = np.array([0.0, 0.0, -9.81])
dyn = E.DynamicsParams(payload=jnp.zeros(N), com_displacement=jnp.zeros((N, 3)),
                       friction=jnp.ones(N), restitution=jnp.zeros(N),
                       gravity=jnp.asarray(G, dtype=f32)[None])
terr = E.flat_terrain()
m_tot = float(np.sum(model.mass))

def momentum(state):
    frames = E.forward_kinematics(model, state)
    ref = state.base_pos
    Sw, Sv = E.joint_twists(model, frames, ref)
    gv = jnp.concatenate([state.base_ang_vel, state.base_lin_vel, state.qd],
                         axis=-1)
    Vw, Vv = E.body_twists(model, Sw, Sv, gv)
    vcom = Vv + jnp.cross(Vw, frames.com - ref[:, None, :])
    p = jnp.sum(jnp.asarray(model.mass)[None, :, None] * vcom, axis=1)
    return np.asarray(p[0])

# violent thrash torques: PD to alternating extreme targets (policy-like)
KP, KD = 20.0, 0.5
lo = jnp.asarray(model.dof_lower, f32); hi = jnp.asarray(model.dof_upper, f32)
def torques(state, t):
    tgt = jnp.where((t // 8) % 2 == 0, hi, lo)[None]
    tau = KP * (tgt - state.q) - KD * state.qd
    lim = jnp.asarray(model.dof_effort, f32)
    return jnp.clip(tau, -lim, lim)

DT = 0.005
STEPS = 80

def run(tag, params, cached):
    state = state0
    if cached:
        def ctrl_step(state, t):
            cache = E.build_dynamics_cache(model, params, state, dyn, terr)
            p_cp = None
            for k in range(4):
                tau = torques(state, t * 4 + k)
                state, info, p_cp = E.physics_substep_cached(
                    model, params, state, tau, dyn, terr, cache, p_cp)
            return state
        step = jax.jit(ctrl_step)
        nouter, inner = STEPS // 4, 4
    else:
        def ctrl_step(state, t):
            tau = torques(state, t)
            state, info = E.physics_substep(model, params, state, tau, dyn,
                                            terr)
            return state
        step = jax.jit(ctrl_step)
        nouter, inner = STEPS, 1
    p0 = momentum(state)
    for t in range(nouter):
        state = step(state, t)
    p1 = momentum(state)
    T = STEPS * DT
    expect = p0 + m_tot * G * T
    err = p1 - expect
    print(f"{tag:28s} P0 {np.round(p0,2)} -> P {np.round(p1,2)} "
          f"expect {np.round(expect,2)}  |err| {np.linalg.norm(err):8.3f} "
          f"qdmax {float(jnp.abs(state.qd).max()):6.1f} "
          f"|v| {float(jnp.linalg.norm(state.base_lin_vel)):7.2f} "
          f"|w| {float(jnp.linalg.norm(state.base_ang_vel)):7.2f}",
          flush=True)

base = E.SimParams(dt=DT, use_pallas_contact=False)
import dataclasses
noclamp = dataclasses.replace(base)  # qd clamp uses model.dof_vel_limit; widen via model? use max_base caps only
run("exact + clamps", base, cached=False)
run("cached(reuse) + clamps", base, cached=True)

# variant with the qd clamp neutralized: hack model vel limits huge
model_nc = dataclasses.replace(model, dof_vel_limit=np.full_like(np.asarray(model.dof_vel_limit), 1e9))
model = model_nc
base_nc = dataclasses.replace(base, max_base_lin_vel=1e9, max_base_ang_vel=1e9)
run("exact, clamps off", base_nc, cached=False)
run("cached, clamps off", base_nc, cached=True)
