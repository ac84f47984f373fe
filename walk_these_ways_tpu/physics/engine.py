"""Batched articulated rigid-body dynamics for TPU (pure JAX).

TPU-native replacement for the reference's IsaacGym/PhysX layer (reference:
go1_gym/envs/base/legged_robot.py:74-81 `gym.simulate` inner loop, config
legged_robot_config.py:402-421).  Design notes:

- Everything is batched over the env dimension; the robot tree is tiny
  (13 bodies / 18 generalized velocities), so all per-robot linear algebra is
  expressed as dense einsums over *static* topology masks precomputed in
  `RobotModel` — XLA fuses these into a handful of large batched contractions
  that map well onto the MXU/VPU.  No gathers with dynamic shapes, no
  data-dependent control flow.
- Generalized coordinates: root position (world), root quaternion (xyzw),
  12 joint angles.  Generalized velocity: root linear velocity (world), root
  angular velocity (world), joint rates — the same layout IsaacGym reports in
  `root_states` / `dof_state`, so env code matches the reference 1:1.
- Mass matrix via CRBA and bias forces via RNEA(qdd=0), both formulated with
  world-frame spatial vectors referenced at each env's base position (keeps
  lever arms ~O(1) m for f32 conditioning regardless of world position).
- Contacts: sphere/point vs. heightfield, solved as velocity-level unilateral
  constraints by row-decoupled projected Jacobi in dual space: per contact,
  a normal row with scalar effective mass n^T W n (W = J M^-1 J^T) driven
  to the restitution/Baumgarte target, and a friction row opposite the slip
  direction with mass t^T W t, clamped to the mu * lambda_n cone — the same
  row structure PhysX/Bullet/MuJoCo PGS use, and the TPU analogue of PhysX
  TGS iterations (solver_type=1, num_position_iterations=4 in the reference
  config).  Kinetic friction saturates the cone exactly (validated against
  MuJoCo in runs/mujoco_parity).  This gives real stiction and restitution
  with *no* penalty-stiffness stability limits at dt=5 ms.
- Joint limits: stiff one-sided springs (hard limits are rarely active for
  this task); joint velocity clamped to the URDF limit like PhysX does.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.robot import RobotModel
from ..ops import linalg as la
from ..ops import quat as qops



# All physics contractions run at HIGHEST matmul precision: TPU's default
# bf16 MXU passes are fine for neural nets but destroy the mass matrix /
# effective-mass conditioning (observed as instant NaNs in training).
from functools import partial as _partial
_einsum = _partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Static solver parameters (jit-constant)."""

    dt: float = 0.005                  # physics step    (reference sim.dt)
    num_contact_iters: int = 16        # projected-Jacobi iterations
    contact_enabled: bool = True       # benchmarking knob
    contact_baumgarte: float = 0.2     # position-error feedback factor
    contact_slop: float = 0.002        # penetration tolerance [m]
    # cap on the Baumgarte push-out velocity (reference physx config
    # max_depenetration_velocity, legged_robot_config.py:418) — unbounded
    # depenetration targets inject energy in deep-penetration pile-ups
    max_depenetration_velocity: float = 1.0
    bounce_threshold_velocity: float = 0.5   # reference physx config
    # hard caps on base velocities (PhysX max_linear/angular_velocity
    # analogue).  Set INSIDE the integrator's stable envelope: the
    # midpoint velocity-product evaluation is near-conservative for
    # tumbling through ~40 rad/s (runs/seed2_blowup), and the task's
    # physical envelope is |v| < ~7 m/s / |w| < ~10 rad/s, so 15/25
    # leaves margin on both sides.  A per-component clamp is NOT
    # momentum-consistent — an env that saturates it is in an
    # unrecoverable crash and is terminated by the envelope guard in
    # envs/go1_env.py (round-4 seed-2 study: 50/50 caps let a
    # post-landing thrash spiral through the old Euler instability and
    # LAUNCH the robot by clamp-rectified momentum injection)
    max_base_lin_vel: float = 15.0
    max_base_ang_vel: float = 25.0
    joint_limit_stiffness: float = 60.0
    joint_limit_damping: float = 2.0
    # Jacobi (simultaneous) impulse updates diverge at relaxation 1.0 when
    # many contacts couple through one body (e.g. the trunk box landing
    # flat); 0.4 keeps the iteration contractive for this model's worst
    # realistic contact sets while 16 iterations restore convergence.
    relaxation: float = 0.4
    armature: float = 0.0
    # run the impulse iteration as a Pallas VMEM-resident kernel
    # (ops/pallas_contact.py) instead of an XLA fori_loop
    use_pallas_contact: bool = False
    # warm-start contact impulses across the decimation substeps of one
    # control step (megastep path only): substep 0 cold-starts with
    # num_contact_iters iterations, later substeps start from the previous
    # substep's converged impulses and run num_contact_iters_warm
    # iterations.  PhysX warm-starts its TGS solver the same way.
    contact_warm_start: bool = False
    num_contact_iters_warm: int = 6
    # additionally seed the FIRST substep from the impulses carried in the
    # env state from the previous control step (and run it at the warm
    # iteration count too) — contacts persist across the 20 ms control
    # boundary just as they do across the 5 ms substeps
    contact_cross_step_warm_start: bool = False

    def __hash__(self):
        return hash(tuple(dataclasses.asdict(self).values()))


class PhysicsState(NamedTuple):
    """Batched rigid-body state (leading dim = num_envs)."""

    base_pos: jnp.ndarray    # (N, 3)
    base_quat: jnp.ndarray   # (N, 4) xyzw
    base_lin_vel: jnp.ndarray  # (N, 3) world
    base_ang_vel: jnp.ndarray  # (N, 3) world
    q: jnp.ndarray           # (N, 12)
    qd: jnp.ndarray          # (N, 12)


class BodyFrames(NamedTuple):
    R: jnp.ndarray       # (N, nb, 3, 3) body-to-world
    p: jnp.ndarray       # (N, nb, 3)   joint-frame origin, world
    com: jnp.ndarray     # (N, nb, 3)   world com
    joint_axis_w: jnp.ndarray   # (N, nj, 3)
    joint_anchor_w: jnp.ndarray  # (N, nj, 3)


class DynamicsParams(NamedTuple):
    """Per-env randomized dynamics (reference domain_rand section)."""

    payload: jnp.ndarray            # (N,) added base mass
    com_displacement: jnp.ndarray   # (N, 3) base com shift
    friction: jnp.ndarray           # (N,) robot shape friction
    restitution: jnp.ndarray        # (N,)
    gravity: jnp.ndarray            # (N, 3) full gravity vector (incl. DR)


class ContactInfo(NamedTuple):
    report_forces: jnp.ndarray   # (N, 17, 3) net contact force per report body
    foot_forces: jnp.ndarray     # (N, 4, 3)


def identity_dynamics_params(n: int, gravity=(-0.0, 0.0, -9.81)) -> DynamicsParams:
    g = jnp.tile(jnp.asarray(gravity, dtype=jnp.float32), (n, 1))
    return DynamicsParams(
        payload=jnp.zeros(n),
        com_displacement=jnp.zeros((n, 3)),
        friction=jnp.ones(n),
        restitution=jnp.zeros(n),
        gravity=g,
    )


# ---------------------------------------------------------------------------
# forward kinematics
# ---------------------------------------------------------------------------


def _axis_angle_rotmat(axis, angle):
    """Rodrigues for a static local axis and batched angle. axis (3,), angle (N,)."""
    a = jnp.asarray(axis, dtype=angle.dtype)
    K = qops.skew(a)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    eye = jnp.eye(3, dtype=angle.dtype)
    return eye + s * K + (1.0 - c) * (K @ K)


def _fk_levels(model: RobotModel):
    """Group joints by tree depth (trace-time): [(joint_ids, parent_bodies)]."""
    depth = np.zeros(model.nb, dtype=int)
    for b in range(1, model.nb):
        depth[b] = depth[model.parent[b]] + 1
    levels = []
    for d in range(1, depth.max() + 1):
        js = [j for j in range(model.nj) if depth[model.joint_body[j]] == d]
        levels.append((np.array(js),
                       np.array([model.parent[model.joint_body[j]] for j in js])))
    return levels


def forward_kinematics(model: RobotModel, state: PhysicsState) -> BodyFrames:
    """Batched FK, vectorized across same-depth joints (all 4 legs' hips in
    one op, then thighs, then calves) — a 3-deep chain of wide ops instead
    of a 12-deep chain of narrow ones."""
    f32 = state.base_pos.dtype
    Rs = [None] * model.nb
    ps = [None] * model.nb
    Rs[0] = qops.quat_to_rotmat(state.base_quat)
    ps[0] = state.base_pos
    axes_w = [None] * model.nj
    for js, parents in _fk_levels(model):
        Rp = jnp.stack([Rs[pb] for pb in parents], axis=1)    # (N, L, 3, 3)
        pp = jnp.stack([ps[pb] for pb in parents], axis=1)    # (N, L, 3)
        anchors = jnp.asarray(model.joint_anchor[js], dtype=f32)   # (L, 3)
        axes = jnp.asarray(model.joint_axis[js], dtype=f32)        # (L, 3)
        K = jnp.asarray(
            np.stack([np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                                [-a[1], a[0], 0]])
                      for a in model.joint_axis[js]]), dtype=f32)  # (L, 3, 3)
        ang = state.q[:, js]                                        # (N, L)
        s = jnp.sin(ang)[..., None, None]
        c = jnp.cos(ang)[..., None, None]
        rot = (jnp.eye(3, dtype=f32) + s * K[None]
               + (1.0 - c) * (K @ K)[None])                        # (N, L, 3, 3)
        Rj = jnp.matmul(Rp, rot, precision=jax.lax.Precision.HIGHEST)
        pj = pp + _einsum("nlij,lj->nli", Rp, anchors)
        aw = _einsum("nlij,lj->nli", Rp, axes)
        for k, j in enumerate(js):
            b = int(model.joint_body[j])
            Rs[b] = Rj[:, k]
            ps[b] = pj[:, k]
            axes_w[j] = aw[:, k]
    R = jnp.stack(Rs, axis=1)
    p = jnp.stack(ps, axis=1)
    com_l = jnp.asarray(model.com, dtype=f32)
    com = p + _einsum("nbij,bj->nbi", R, com_l)
    N = state.base_pos.shape[0]
    if model.nj == 0:          # single free body (e.g. models.robot.box)
        empty = jnp.zeros((N, 0, 3), f32)
        return BodyFrames(R=R, p=p, com=com, joint_axis_w=empty,
                          joint_anchor_w=empty)
    anchors_w = jnp.stack([ps[int(model.joint_body[j])]
                           for j in range(model.nj)], axis=1)
    return BodyFrames(
        R=R,
        p=p,
        com=com,
        joint_axis_w=jnp.stack(axes_w, axis=1),
        joint_anchor_w=anchors_w,
    )


# ---------------------------------------------------------------------------
# spatial algebra helpers (angular-first 6-vectors, reference point = base)
# ---------------------------------------------------------------------------


class InertiaBlocks(NamedTuple):
    """Spatial inertia about the reference point in 3x3 block form:
    I_b = [[A_b, B_b], [B_b^T, m_b I]].  Avoids ever materializing 6x6
    blocks — TPU pays dearly for small-minor-dim concatenates/relayouts."""

    A: jnp.ndarray   # (N, nb, 3, 3)
    B: jnp.ndarray   # (N, nb, 3, 3)  = m * skew(com - ref)
    m: jnp.ndarray   # (N, nb)


def joint_twists(model: RobotModel, frames: BodyFrames, ref: jnp.ndarray):
    """All nv twists about per-env reference point `ref`, split into angular
    and linear parts.  Returns (Sw, Sv), each (N, nv, 3).

    Row layout matches the generalized velocity [ang(3), lin(3), qd(nj)].
    """
    N = ref.shape[0]
    f32 = ref.dtype
    eye = jnp.broadcast_to(jnp.eye(3, dtype=f32), (N, 3, 3))
    zero = jnp.zeros((N, 3, 3), f32)
    a = frames.joint_axis_w
    lin = jnp.cross(frames.joint_anchor_w - ref[:, None, :], a)
    Sw = jnp.concatenate([eye, zero, a], axis=1)
    Sv = jnp.concatenate([zero, eye, lin], axis=1)
    return Sw, Sv


def inertia_blocks(model: RobotModel, frames: BodyFrames, ref: jnp.ndarray,
                   dyn: DynamicsParams) -> InertiaBlocks:
    """Per-body spatial inertia blocks about ref."""
    f32 = ref.dtype
    mass = jnp.asarray(model.mass, dtype=f32)[None, :]            # (1, nb)
    # base payload + com displacement domain randomization
    dm = jnp.pad(dyn.payload[:, None], ((0, 0), (0, model.nb - 1)))
    m = mass + dm                                                  # (N, nb)
    com = frames.com
    base_com_shift = _einsum("nij,nj->ni", frames.R[:, 0], dyn.com_displacement)
    com = com.at[:, 0, :].add(base_com_shift)
    # rotational inertia to world; base inertia scaled with payload mass ratio
    I_l = jnp.asarray(model.inertia, dtype=f32)[None]              # (1, nb, 3, 3)
    scale = jnp.ones_like(m).at[:, 0].set(m[:, 0] / mass[0, 0])
    I_w = _einsum("nbij,nbjk,nblk->nbil", frames.R, I_l * scale[..., None, None], frames.R)
    r = com - ref[:, None, :]
    rx = qops.skew(r)                                              # (N, nb, 3, 3)
    mrx = m[..., None, None] * rx
    # HIGHEST precision: a default-precision matmul here runs the MXU in
    # bf16 (observed in the round-2 profile as f32->bf16 layout copies) and
    # loses mass-matrix conditioning
    A = I_w - jnp.matmul(mrx, rx, precision=jax.lax.Precision.HIGHEST)
    return InertiaBlocks(A=A, B=mrx, m=m)


def _joint_anc_pair(model: RobotModel) -> np.ndarray:
    """(nj, nj) static mask: joint i is an ancestor of (or equals) joint j."""
    L = np.zeros((model.nj, model.nj), dtype=np.float32)
    for i in range(model.nj):
        for j in range(model.nj):
            if model.subtree[model.joint_body[i], model.joint_body[j]]:
                L[i, j] = 1.0
    return L


def mass_matrix(model: RobotModel, Sw: jnp.ndarray, Sv: jnp.ndarray,
                blk: InertiaBlocks) -> jnp.ndarray:
    """CRBA in 3x3 block form. (N, nv, nv).

    Key identities (about the shared reference point):
    - the root 6x6 block is the whole-robot composite [[sum A, sum B],
      [sum B^T, sum m * I]] — no contraction at all;
    - for any pair where j is the deeper dof, M[i, j] = Sw_i . a_j +
      Sv_i . b_j with a_j = Ac_j w_j + Bc_j v_j and b_j = Bc_j^T w_j +
      mc_j v_j, where (Ac, Bc, mc) are the composite blocks of joint j's
      subtree.  One (N, nv, nj) contraction covers the root-joint block
      (root twist rows are unit vectors) and the joint-joint triangle.
    """
    f32 = Sw.dtype
    sub_j = jnp.asarray(model.anc_dof_body[6:, :], dtype=f32)   # (nj, nb)
    Ac = _einsum("jb,nbxy->njxy", sub_j, blk.A)
    Bc = _einsum("jb,nbxy->njxy", sub_j, blk.B)
    mc = _einsum("jb,nb->nj", sub_j, blk.m)
    wj = Sw[:, 6:, :]
    vj = Sv[:, 6:, :]
    a = (_einsum("njxy,njy->njx", Ac, wj)
         + _einsum("njxy,njy->njx", Bc, vj))                  # (N, nj, 3)
    b = (_einsum("njyx,njy->njx", Bc, wj) + mc[..., None] * vj)
    E = (_einsum("nix,njx->nij", Sw, a)
         + _einsum("nix,njx->nij", Sv, b))                    # (N, nv, nj)

    A_tot = jnp.sum(blk.A, axis=1)
    B_tot = jnp.sum(blk.B, axis=1)
    m_tot = jnp.sum(blk.m, axis=1)
    eye = jnp.eye(3, dtype=f32)
    top_left = jnp.concatenate([
        jnp.concatenate([A_tot, B_tot], axis=-1),
        jnp.concatenate([jnp.swapaxes(B_tot, -1, -2),
                         m_tot[:, None, None] * eye], axis=-1),
    ], axis=-2)                                                   # (N, 6, 6)

    top_right = E[:, :6, :]                                       # (N, 6, nj)
    L = jnp.asarray(_joint_anc_pair(model), dtype=f32)            # (nj, nj)
    Ej = E[:, 6:, :]
    LE = L[None] * Ej
    diag = _einsum("njj->nj", Ej)
    lower_right = LE + jnp.swapaxes(LE, -1, -2) \
        - diag[:, :, None] * jnp.eye(model.nj, dtype=f32)
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(top_right, -1, -2), lower_right],
                          axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def bias_forces(model: RobotModel, Sw, Sv, Vw, Vv, blk: InertiaBlocks,
                gen_vel: jnp.ndarray, gravity: jnp.ndarray) -> jnp.ndarray:
    """RNEA with qdd=0 (Coriolis + gravity) in block form. (N, nv).

    The parent->child acceleration recursion expands to a masked sum —
    A_b = A_base + sum_{j in path(b)} (V_child(j) x^ S_j) qd_j — three
    batched contractions, no sequential chain.
    """
    N = gen_vel.shape[0]
    f32 = gen_vel.dtype
    qd = gen_vel[:, 6:, None]
    # per-joint velocity-product terms (joint j moves body j+1 by construction)
    Vwj, Vvj = Vw[:, 1:, :], Vv[:, 1:, :]
    Swj, Svj = Sw[:, 6:, :], Sv[:, 6:, :]
    Cw = jnp.cross(Vwj, Swj) * qd
    Cv = (jnp.cross(Vwj, Svj) + jnp.cross(Vvj, Swj)) * qd
    anc_j = jnp.asarray(model.anc_dof_body[6:, :], dtype=f32)  # (nj, nb)
    aw = _einsum("jb,njx->nbx", anc_j, Cw)
    av = -gravity[:, None, :] + _einsum("jb,njx->nbx", anc_j, Cv)

    def I_apply(w, v):
        return (_einsum("nbxy,nby->nbx", blk.A, w)
                + _einsum("nbxy,nby->nbx", blk.B, v),
                _einsum("nbyx,nby->nbx", blk.B, w)
                + blk.m[..., None] * v)

    IVw, IVv = I_apply(Vw, Vv)
    IAw, IAv = I_apply(aw, av)
    Fw = IAw + jnp.cross(Vw, IVw) + jnp.cross(Vv, IVv)
    Fv = IAv + jnp.cross(Vw, IVv)
    anc = jnp.asarray(model.anc_dof_body, dtype=f32)
    return (_einsum("db,ndx,nbx->nd", anc, Sw, Fw)
            + _einsum("db,ndx,nbx->nd", anc, Sv, Fv))


def body_twists(model: RobotModel, Sw, Sv, gen_vel: jnp.ndarray):
    """Per-body twists (Vw, Vv), each (N, nb, 3)."""
    anc = jnp.asarray(model.anc_dof_body, dtype=Sw.dtype)
    Vw = _einsum("db,ndx,nd->nbx", anc, Sw, gen_vel)
    Vv = _einsum("db,ndx,nd->nbx", anc, Sv, gen_vel)
    return Vw, Vv


def _mass_matrix_inverse(model: RobotModel, M: jnp.ndarray) -> jnp.ndarray:
    """Pick the fast closed-form inverse when the topology allows it
    (star of 3-dof chains, e.g. quadrupeds); generic fallback otherwise.
    The check is on static topology — resolved at trace time."""
    njc = model.nv - 6
    if njc > 0 and njc % 3 == 0:
        C = njc // 3
        expected = np.kron(np.eye(C), np.ones((3, 3)))
        if (model.crba_conn[6:, 6:] == expected).all():
            return la.mass_matrix_inverse(M, num_chains=C)
    return jnp.linalg.inv(M)


# ---------------------------------------------------------------------------
# contact
# ---------------------------------------------------------------------------


class Terrain(NamedTuple):
    """Heightfield terrain. A zero field is flat ground at z=0.

    `corners` is a precomputed corner-packed copy of the field:
    corners[i, j] = (h[i,j], h[i+1,j], h[i,j+1], h[i+1,j+1]).  Bilinear
    lookup then needs ONE gather of a contiguous 4-float slice per query
    point instead of four separate scalar gathers — TPU gathers are
    index-bound, so this is ~4x cheaper, and the round-5 rough-terrain
    profile showed the four corner gathers were 44% of the whole train
    iteration (scripts/profile_train.py --terrain rough).  Build with
    `make_heightfield_terrain` to get it for free; a None falls back to
    the four-gather path (old pickled states restore fine)."""

    height: jnp.ndarray        # (rows, cols) float32 heights [m]
    horizontal_scale: float    # grid pitch [m] (static)
    origin_xy: tuple           # (x0, y0) of grid index (0, 0)  (static)
    corners: jnp.ndarray = None  # (rows-1, cols-1, 4) packed corner heights

    def lookup(self, x, y):
        """Bilinear height + surface normal at world (x, y). Shapes preserved."""
        if self.height.shape == (2, 2):
            # flat-ground fast path (static shape check): no gathers
            h = jnp.zeros_like(x) + self.height[0, 0]
            n = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], dtype=x.dtype), x.shape + (3,))
            return h, n
        hs = self.horizontal_scale
        gx = (x - self.origin_xy[0]) / hs
        gy = (y - self.origin_xy[1]) / hs
        H, W = self.height.shape
        i0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, H - 2)
        j0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, W - 2)
        fx = jnp.clip(gx - i0, 0.0, 1.0)
        fy = jnp.clip(gy - j0, 0.0, 1.0)
        if self.corners is not None:
            # one gather of contiguous 4-vectors on the flattened grid
            c = jnp.take(self.corners.reshape(-1, 4),
                         i0 * (W - 1) + j0, axis=0)
            h00, h10, h01, h11 = c[..., 0], c[..., 1], c[..., 2], c[..., 3]
        else:
            h00 = self.height[i0, j0]
            h10 = self.height[i0 + 1, j0]
            h01 = self.height[i0, j0 + 1]
            h11 = self.height[i0 + 1, j0 + 1]
        h = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
             + h01 * (1 - fx) * fy + h11 * fx * fy)
        dhdx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) / hs
        dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / hs
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n


def flat_terrain() -> Terrain:
    return Terrain(height=jnp.zeros((2, 2), jnp.float32),
                   horizontal_scale=1.0, origin_xy=(-1e4, -1e4))


def make_heightfield_terrain(height, horizontal_scale, origin_xy) -> Terrain:
    """Heightfield Terrain with the corner-packed lookup table prebuilt."""
    height = jnp.asarray(height, dtype=jnp.float32)
    corners = jnp.stack(
        [height[:-1, :-1], height[1:, :-1], height[:-1, 1:], height[1:, 1:]],
        axis=-1)
    return Terrain(height=height, horizontal_scale=horizontal_scale,
                   origin_xy=origin_xy, corners=corners)


def _contact_solve(model: RobotModel, params: SimParams, Minv, Sw, Sv, frames,
                   ref, gen_vel, terrain: Terrain, dyn: DynamicsParams,
                   dt: float):
    """Velocity-level unilateral contact solve.

    Returns (delta_gen_vel, world contact force per contact point (N, P, 3)).
    """
    f32 = gen_vel.dtype
    N = gen_vel.shape[0]
    P = model.cp_body.shape[0]
    # contact point world positions — one-hot matmuls instead of gathers
    # (constant-index gathers lower terribly on TPU)
    cp_onehot = jnp.asarray(
        np.eye(model.nb, dtype=np.float32)[model.cp_body], dtype=f32)  # (P, nb)
    cp_off = jnp.asarray(model.cp_offset, dtype=f32)
    Rb = _einsum("pb,nbij->npij", cp_onehot, frames.R)  # (N, P, 3, 3)
    pb = _einsum("pb,nbi->npi", cp_onehot, frames.p)
    p_cp = pb + _einsum("npij,pj->npi", Rb, cp_off)   # (N, P, 3)
    radius = jnp.asarray(model.cp_radius, dtype=f32)
    h, n_srf = terrain.lookup(p_cp[..., 0], p_cp[..., 1])
    phi = h + radius[None, :] - p_cp[..., 2]             # penetration depth
    active = phi > 0.0

    # point Jacobians J (N, P, 3, nv): rows = world velocity of contact point
    anc_p = jnp.asarray(
        model.anc_dof_body[:, model.cp_body], dtype=f32)  # (nv, P) static
    r = p_cp - ref[:, None, :]                           # (N, P, 3)
    nv = Sw.shape[1]
    # v_point = Sv + Sw x r  for each dof, masked by ancestry
    Jl = Sv[:, None, :, :] + jnp.cross(
        jnp.broadcast_to(Sw[:, None, :, :], (N, P, nv, 3)),
        jnp.broadcast_to(r[:, :, None, :], (N, P, nv, 3)),
    )
    J = Jl * anc_p.T[None, :, None, :].transpose(0, 1, 3, 2)  # mask (P, nv)
    J = jnp.swapaxes(J, 2, 3)                            # (N, P, 3, nv)

    # M^-1 J^T via the precomputed closed-form inverse (ops/linalg.py)
    MinvJT_p = _einsum("nvw,npiw->npvi", Minv, J)     # (N, P, nv, 3)
    # per-point effective-mass blocks  W = J M^-1 J^T + eps I (3x3)
    W = _einsum("npiv,npvj->npij", J, MinvJT_p)
    W = W + 1e-6 * jnp.eye(3, dtype=f32)

    mu = 0.5 * (dyn.friction[:, None] + 1.0)             # average combine w/ ground
    e = dyn.restitution[:, None]

    v0 = _einsum("npiv,nv->npi", J, gen_vel)
    vn0 = _einsum("npi,npi->np", v0, n_srf)
    bounce = jnp.where(vn0 < -params.bounce_threshold_velocity, -e * vn0, 0.0)
    bias = jnp.minimum(
        params.contact_baumgarte / dt * jnp.maximum(phi - params.contact_slop, 0.0),
        params.max_depenetration_velocity)
    target_n = jnp.maximum(bounce, bias)

    lam, gen_vel_new = _impulse_iteration(
        params, J, MinvJT_p, W, n_srf, target_n, mu, active, gen_vel)
    forces = lam / dt                                     # impulses -> forces
    return gen_vel_new - gen_vel, forces, p_cp


def _impulse_iteration(params: SimParams, J, MinvJT_p, W, n_srf, target_n,
                       mu, active, gen_vel):
    """Row-decoupled projected-Jacobi impulse iterations (XLA fori_loop).

    Each contact solves two decoupled scalar rows against its effective-
    mass matrix W = J M^-1 J^T: the normal row drives v_n to target with
    mass n^T W n; the friction row pushes opposite the current slip
    direction t with mass t^T W t, then the accumulated tangential
    impulse is clamped to the mu * lambda_n cone.  This is the classical
    PGS/sequential-impulse structure (PhysX/Bullet/MuJoCo): at a sliding
    contact the friction impulse saturates the cone exactly.  The earlier
    coupled 3x3 block solve (Lam = W^-1 applied to the full desired
    velocity change) chased the unreachable target "slip -> 0", and its
    cone projection biased the fixed point ~12% inside the cone with
    ~9 mm penetration creep (see runs/mujoco_parity).

    The Pallas env-minor pipeline implements the identical iteration in
    ops/pallas_contact.contact_core (used by the cached/megastep paths);
    this XLA path serves heightfield terrain and oracle tests."""
    N, P = target_n.shape
    lam0 = jnp.zeros((N, P, 3), gen_vel.dtype)
    w_nn = _einsum("npi,npij,npj->np", n_srf, W, n_srf)
    inv_w_nn = params.relaxation / w_nn

    def iter_body(_, carry):
        lam, gv = carry
        v = _einsum("npiv,nv->npi", J, gv)
        vn = _einsum("npi,npi->np", v, n_srf)
        vt = v - vn[..., None] * n_srf
        vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-18)
        t = vt / vt_norm[..., None]
        # vt = 0 exactly makes t the zero vector: floor w_tt at eps
        w_tt = jnp.maximum(_einsum("npi,npij,npj->np", t, W, t), 1e-6)
        dln = (target_n - vn) * inv_w_nn
        dlt = -params.relaxation * vt_norm / w_tt
        l_n0 = _einsum("npi,npi->np", lam, n_srf)
        ln = jnp.maximum(l_n0 + dln, 0.0)
        lt = lam - l_n0[..., None] * n_srf + dlt[..., None] * t
        lt_norm = jnp.sqrt(jnp.sum(lt * lt, axis=-1) + 1e-18)
        max_t = mu * ln
        scale = jnp.where(lt_norm > max_t, max_t / lt_norm, 1.0)
        new_lam = ln[..., None] * n_srf + lt * scale[..., None]
        new_lam = jnp.where(active[..., None], new_lam, 0.0)
        applied = new_lam - lam
        gv = gv + _einsum("npvi,npi->nv", MinvJT_p, applied)
        return new_lam, gv

    return jax.lax.fori_loop(
        0, params.num_contact_iters, iter_body, (lam0, gen_vel))


# ---------------------------------------------------------------------------
# cached control step (matrix reuse across decimation substeps)
# ---------------------------------------------------------------------------


class PallasOps(NamedTuple):
    """Env-minor cache operands for the Pallas substep kernel
    (ops/pallas_dynamics.py); built once per control step by
    physics/envminor.py + the contact-cache kernel."""

    J_t: jnp.ndarray       # (P, 3, nv, Npad)
    W_t: jnp.ndarray       # (P, 9, Npad) effective-mass J M^-1 J^T + eps I
    Minv_t: jnp.ndarray    # (nv, nv, Npad)
    rh_t: jnp.ndarray      # (P, Npad) radius + terrain height per point
    mu_t: jnp.ndarray      # (1, Npad)
    e_t: jnp.ndarray       # (1, Npad)
    p_cp_t: jnp.ndarray    # (P, 3, Npad)
    Sw_t: jnp.ndarray      # (nv, 3, Npad)
    Sv_t: jnp.ndarray      # (nv, 3, Npad)
    A_t: jnp.ndarray       # (nb, 9, Npad)
    B_t: jnp.ndarray       # (nb, 9, Npad)
    m_t: jnp.ndarray       # (nb, Npad)
    g_t: jnp.ndarray       # (3, Npad)
    n_t: jnp.ndarray = None   # (P, 3, Npad) surface normals (None = flat +z)
    block: int = 256


class DynamicsCache(NamedTuple):
    """Per-control-step cached dynamics quantities, anchored at the first
    substep's geometry.  M(q)/M^-1, twist bases, inertia blocks, and contact
    Jacobian factorizations vary on the ~cm / ~3deg scale across a 20 ms
    control step; reusing them for the remaining decimation substeps trades
    a small geometric lag for skipping the most expensive contractions.
    Enabled via Cfg.sim.reuse_matrices (off by default = exact per-substep
    recomputation like PhysX).

    In Pallas mode (SimParams.use_pallas_contact) the whole cache is built
    env-minor (physics/envminor.py) and only `ref` + `pallas_ops` are
    populated — the N-major tensors never exist."""

    ref: jnp.ndarray          # (N, 3) anchor reference point
    Sw: jnp.ndarray = None
    Sv: jnp.ndarray = None
    blk: InertiaBlocks = None
    Minv: jnp.ndarray = None
    J: jnp.ndarray = None     # (N, P, 3, nv)
    MinvJT_p: jnp.ndarray = None   # (N, P, nv, 3)
    W: jnp.ndarray = None     # (N, P, 3, 3) effective-mass J M^-1 J^T + eps I
    p_cp: jnp.ndarray = None  # (N, P, 3) contact point world positions at
    # the anchor state — integrated at velocity level across the control
    # step's substeps (p' = p + dt J qd) instead of re-running FK, the same
    # first-order-in-dt approximation reuse mode already makes for J/M
    pallas_ops: PallasOps = None


def build_pallas_env_inputs(model: RobotModel, state: PhysicsState,
                            dyn: DynamicsParams,
                            terrain: "Terrain | None" = None,
                            block: int = 256):
    """Env-minor kernel inputs for the Pallas pipeline: the scalar-per-env
    dynamics cache (physics/envminor.py) plus per-point gap offsets,
    friction/restitution, gravity and (heightfield only) surface normals.
    Shared by build_dynamics_cache (per-substep kernels) and the
    whole-control-step kernel path (ops/pallas_megastep.py).

    Returns (em: EnvMinorCache, rh_t (P, Npad), mu_t (1, Npad),
    e_t (1, Npad), g_t (3, Npad), n_t (P, 3, Npad) | None)."""
    from ..ops import pallas_contact as pc
    from . import envminor
    f32 = state.base_pos.dtype
    N = state.base_pos.shape[0]
    em = envminor.build_cache_envminor(model, state, dyn, block)
    P = model.cp_body.shape[0]
    # per-point radius + terrain height; on a heightfield, h and the
    # surface normal are sampled at the cache geometry (exact mode
    # rebuilds the cache per substep => fresh h/n; reuse mode holds
    # them for the control step — the same first-order-in-dt
    # approximation reuse makes for J/M)
    radius = jnp.asarray(model.cp_radius, dtype=f32)
    Npad = em.Sw_t.shape[-1]
    if terrain is not None and terrain.height.shape != (2, 2):
        p_cp = pc.from_env_minor(em.p_cp_t, N)           # (N, P, 3)
        h, n_srf = terrain.lookup(p_cp[..., 0], p_cp[..., 1])
        rh_t = pc.to_env_minor(h + radius[None, :], block)
        n_t = pc.to_env_minor(n_srf, block)
    else:
        rh_t = jnp.broadcast_to(radius[:, None], (P, Npad))
        n_t = None
    mu_t = pc.to_env_minor(0.5 * (dyn.friction[:, None] + 1.0), block)
    e_t = pc.to_env_minor(dyn.restitution[:, None], block)
    g_t = pc.to_env_minor(dyn.gravity, block)
    return em, rh_t, mu_t, e_t, g_t, n_t


def build_dynamics_cache(model: RobotModel, params: SimParams,
                         state: PhysicsState, dyn: DynamicsParams,
                         terrain: "Terrain | None" = None) -> DynamicsCache:
    f32 = state.base_pos.dtype
    N = state.base_pos.shape[0]
    ref = state.base_pos
    if params.use_pallas_contact:
        # env-minor pipeline: FK/inertia/CRBA/M^-1 in scalar-per-env form
        # (physics/envminor.py), J/W in the Pallas cache kernel — no
        # N-major dynamics tensor is ever materialized
        from ..ops import pallas_contact as pc
        interpret = jax.default_backend() != "tpu"
        block = 256
        em, rh_t, mu_t, e_t, g_t, n_t = build_pallas_env_inputs(
            model, state, dyn, terrain, block)
        anc_pn = jnp.asarray(model.anc_dof_body[:, model.cp_body].T,
                             dtype=f32)                      # (P, nv)
        J_t, W_t = pc.build_contact_cache_pallas(
            anc_pn, em.Sw_t, em.Sv_t, em.Minv_t, em.r_t, block=block,
            interpret=interpret)
        pallas_ops = PallasOps(
            J_t=J_t, W_t=W_t, Minv_t=em.Minv_t, rh_t=rh_t, mu_t=mu_t,
            e_t=e_t, p_cp_t=em.p_cp_t, Sw_t=em.Sw_t, Sv_t=em.Sv_t,
            A_t=em.A_t, B_t=em.B_t, m_t=em.m_t, g_t=g_t, n_t=n_t,
            block=block)
        return DynamicsCache(ref=ref, pallas_ops=pallas_ops)

    frames = forward_kinematics(model, state)
    Sw, Sv = joint_twists(model, frames, ref)
    blk = inertia_blocks(model, frames, ref, dyn)
    M = mass_matrix(model, Sw, Sv, blk)
    M = M + 1e-7 * jnp.eye(model.nv, dtype=f32)[None]
    Minv = _mass_matrix_inverse(model, M)
    # contact Jacobians at anchor geometry
    P = model.cp_body.shape[0]
    cp_onehot = jnp.asarray(
        np.eye(model.nb, dtype=np.float32)[model.cp_body], dtype=f32)
    cp_off = jnp.asarray(model.cp_offset, dtype=f32)
    Rb = _einsum("pb,nbij->npij", cp_onehot, frames.R)
    pb = _einsum("pb,nbi->npi", cp_onehot, frames.p)
    p_cp = pb + _einsum("npij,pj->npi", Rb, cp_off)
    anc_p = jnp.asarray(model.anc_dof_body[:, model.cp_body], dtype=f32)
    r = p_cp - ref[:, None, :]
    nv = Sw.shape[1]
    Jl = Sv[:, None, :, :] + jnp.cross(
        jnp.broadcast_to(Sw[:, None, :, :], (N, P, nv, 3)),
        jnp.broadcast_to(r[:, :, None, :], (N, P, nv, 3)))
    J = jnp.swapaxes(Jl * anc_p.T[None, :, None, :].transpose(0, 1, 3, 2), 2, 3)
    MinvJT_p = _einsum("nvw,npiw->npvi", Minv, J)
    W = _einsum("npiv,npvj->npij", J, MinvJT_p) + 1e-6 * jnp.eye(3, dtype=f32)
    return DynamicsCache(ref=ref, Sw=Sw, Sv=Sv, blk=blk, Minv=Minv, J=J,
                         MinvJT_p=MinvJT_p, W=W, p_cp=p_cp)


def physics_substep_cached(
    model: RobotModel,
    params: SimParams,
    state: PhysicsState,
    joint_torques: jnp.ndarray,
    dyn: DynamicsParams,
    terrain: Terrain,
    cache: DynamicsCache,
    p_cp: jnp.ndarray | None = None,
) -> tuple[PhysicsState, ContactInfo, jnp.ndarray]:
    """Substep using cached matrices (fresh: torques, contact gaps, bias
    velocity terms, integration).

    `p_cp` is the carried contact-point position estimate (starts at
    cache.p_cp, advanced here by dt * J qd — no per-substep FK); returns
    (new_state, contact_info, p_cp_new)."""
    f32 = state.base_pos.dtype
    N = state.base_pos.shape[0]
    dt = params.dt
    ref = cache.ref
    # generalized velocity expressed at the anchor point
    delta = ref - state.base_pos
    v_ref = state.base_lin_vel + jnp.cross(state.base_ang_vel, delta)
    gen_vel = jnp.concatenate([state.base_ang_vel, v_ref, state.qd], axis=-1)

    lo = jnp.asarray(model.dof_lower, dtype=f32)
    hi = jnp.asarray(model.dof_upper, dtype=f32)
    over_hi = jnp.maximum(state.q - hi, 0.0)
    under_lo = jnp.maximum(lo - state.q, 0.0)
    tau_lim = (params.joint_limit_stiffness * (under_lo - over_hi)
               - params.joint_limit_damping
               * ((over_hi > 0) | (under_lo > 0)) * state.qd)
    tau = jnp.concatenate(
        [jnp.zeros((N, 6), f32), joint_torques + tau_lim], axis=-1)

    use_pallas = bool(params.use_pallas_contact
                      and cache.pallas_ops is not None)
    lam_t = None
    if use_pallas:
        # full env-minor substep in one VMEM kernel: twists + bias + qdd +
        # contact solve + point advance (ops/pallas_dynamics.py); `p_cp`
        # is carried env-minor (P, 3, Npad), lam returned env-minor too
        from ..ops import pallas_contact as pc
        from ..ops import pallas_dynamics as pd
        po = cache.pallas_ops
        if p_cp is None:
            p_cp = po.p_cp_t
        gv_t = pc.to_env_minor(gen_vel, po.block)
        tau_t = pc.to_env_minor(tau, po.block)
        vlim = jnp.concatenate([
            jnp.full((3,), params.max_base_ang_vel, f32),
            jnp.full((3,), params.max_base_lin_vel, f32),
            jnp.asarray(model.dof_vel_limit, dtype=f32)])[:, None]
        gv_new_t, p_cp, lam_t = pd.dynamics_substep_pallas(
            po.Sw_t, po.Sv_t, po.A_t, po.B_t, po.m_t, po.Minv_t, po.g_t,
            tau_t, gv_t, po.J_t, po.W_t, p_cp, po.rh_t, po.mu_t, po.e_t,
            vlim, po.n_t, anc=model.anc_dof_body,
            joint_body=model.joint_body,
            cp_body=model.cp_body,
            dt=dt, num_iters=params.num_contact_iters,
            relaxation=params.relaxation,
            baumgarte=params.contact_baumgarte, slop=params.contact_slop,
            max_depen=params.max_depenetration_velocity,
            bounce_thresh=params.bounce_threshold_velocity,
            contact=bool(params.contact_enabled), block=po.block,
            interpret=jax.default_backend() != "tpu")
        gen_vel_new = pc.from_env_minor(gv_new_t, N)
        cp_forces = None          # materialized lazily from lam_t by caller
        gen_vel_free = None
    else:
        # midpoint (RK2) on the velocity-product terms (see physics_substep)
        def qdd_of(gv):
            Vw_, Vv_ = body_twists(model, cache.Sw, cache.Sv, gv)
            b = bias_forces(model, cache.Sw, cache.Sv, Vw_, Vv_, cache.blk,
                            gv, dyn.gravity)
            qdd = _einsum("nij,nj->ni", cache.Minv, tau - b)
            return qdd.at[:, 3:6].add(jnp.cross(gv[:, :3], gv[:, 3:6]))

        gv_mid = gen_vel + (0.5 * dt) * qdd_of(gen_vel)
        gen_vel_free = gen_vel + dt * qdd_of(gv_mid)
        if p_cp is None:
            p_cp = cache.p_cp
    if use_pallas:
        pass
    elif params.contact_enabled:
        # fresh contact gaps from the velocity-integrated point estimate;
        # cached J/W
        radius = jnp.asarray(model.cp_radius, dtype=f32)
        h, n_srf = terrain.lookup(p_cp[..., 0], p_cp[..., 1])
        phi = h + radius[None, :] - p_cp[..., 2]
        active = phi > 0.0
        mu = 0.5 * (dyn.friction[:, None] + 1.0)
        e = dyn.restitution[:, None]
        v0 = _einsum("npiv,nv->npi", cache.J, gen_vel_free)
        vn0 = _einsum("npi,npi->np", v0, n_srf)
        bounce = jnp.where(vn0 < -params.bounce_threshold_velocity,
                           -e * vn0, 0.0)
        cbias = jnp.minimum(
            params.contact_baumgarte / dt * jnp.maximum(
                phi - params.contact_slop, 0.0),
            params.max_depenetration_velocity)
        target_n = jnp.maximum(bounce, cbias)
        lam, gen_vel_new = _impulse_iteration(
            params, cache.J, cache.MinvJT_p, cache.W, n_srf, target_n,
            mu, active, gen_vel_free)
        cp_forces = lam / dt
    else:
        P = model.cp_body.shape[0]
        cp_forces = jnp.zeros((N, P, 3), f32)
        gen_vel_new = gen_vel_free

    vlim = jnp.asarray(model.dof_vel_limit, dtype=f32)
    qd_new = jnp.clip(gen_vel_new[:, 6:], -vlim, vlim)
    ang_new = jnp.clip(gen_vel_new[:, :3], -params.max_base_ang_vel,
                       params.max_base_ang_vel)
    v_ref_new = jnp.clip(gen_vel_new[:, 3:6], -params.max_base_lin_vel,
                         params.max_base_lin_vel)
    # velocity back at the (moved) base point
    lin_new = v_ref_new - jnp.cross(ang_new, delta)

    base_pos = state.base_pos + dt * lin_new
    base_quat = qops.quat_integrate(state.base_quat, ang_new, dt)
    q_new = state.q + dt * qd_new
    new_state = PhysicsState(
        base_pos=base_pos, base_quat=base_quat, base_lin_vel=lin_new,
        base_ang_vel=ang_new, q=q_new, qd=qd_new)
    if use_pallas:
        # impulses stay env-minor; only the final substep's forces are
        # consumed, so the caller materializes them once per control step
        # via contact_report_from_lam_t (avoids a 42x-lane-padded
        # (N, P, 3) write per substep); p_cp was advanced in-kernel
        return new_state, lam_t, p_cp
    rep_onehot = jnp.asarray(
        np.eye(model.num_report_bodies, dtype=np.float32)[model.cp_report_body],
        dtype=f32)
    seg = _einsum("pr,npi->nri", rep_onehot, cp_forces)
    foot_forces = cp_forces[:, model.cp_is_foot, :]
    # advance the contact-point estimate with the post-solve velocities
    gv_clipped = jnp.concatenate(
        [ang_new, v_ref_new, qd_new], axis=-1)
    v_cp = _einsum("npiv,nv->npi", cache.J, gv_clipped)
    p_cp_new = p_cp + dt * v_cp
    return new_state, ContactInfo(report_forces=seg, foot_forces=foot_forces), \
        p_cp_new


# 128-env blocks for the mega-kernel: its working set (double-buffered
# cache inputs + in-VMEM J build) exceeds the 16 MB scoped-vmem limit at 256
MEGASTEP_BLOCK = 128
# exact mode uses a wider block so the in-kernel cache-rebuild chain's
# (8, block/8)-reshaped scalar ops are full (8, 128) VPU tiles
EXACT_MEGASTEP_BLOCK = 1024


def control_step_megakernel(
    model: RobotModel,
    params: SimParams,
    state: PhysicsState,
    dyn: DynamicsParams,
    terrain: "Terrain | None",
    tgt_eff: jnp.ndarray,          # (N, D, 12) per-substep effective targets
    strengths: jnp.ndarray,        # (N, 12)
    torque_limits: jnp.ndarray,    # (12,)
    ctrl,                          # ("P", kp_eff, kd_eff) or
                                   # ("actuator_net", blockdiag_weights,
                                   #  (el, ell, vl, vll) each (N, 12))
    decimation: int,
    lam_in_t=None,                 # (P, 3, Npad) cross-step warm seed
    exact: bool = False,
):
    """One whole control step through the Pallas mega-kernel
    (ops/pallas_megastep.py): `decimation` substeps of torque model +
    cached dynamics + contact + integration in a single launch, with the
    J/W cache built in-kernel.  Reuse-mode semantics (cache anchored at
    the entry state, contact points advanced at velocity level) — or,
    with `exact=True`, EXACT per-substep semantics: the kernel rebuilds
    the full cache (FK/twists/inertia/CRBA/M^-1/J/W) from the current
    state before every substep, in VMEM (flat ground only; contact
    always cold-starts, matching engine.physics_substep).

    Returns (new_state, lam_t, pcp_t, pcp_prev_t, torques (N, 12),
    hist (dict of (N, 12) actuator histories, empty for P control))."""
    from ..ops import pallas_contact as pc
    from ..ops import pallas_megastep as pm
    f32 = state.base_pos.dtype
    N = state.base_pos.shape[0]
    block = EXACT_MEGASTEP_BLOCK if exact else MEGASTEP_BLOCK
    interpret = jax.default_backend() != "tpu"
    # exact mode sublane-splits every batch input EXCEPT lam_in_t, and it
    # always cold-starts contacts in-kernel; a combined call would hit an
    # opaque shape error deep inside the Pallas kernel
    assert lam_in_t is None or not exact, \
        "cross-step warm start (lam_in_t) is incompatible with exact mode"

    if exact:
        # no host-side cache: the kernel rebuilds it per substep.  Flat
        # ground only (heightfield exact falls back to the per-substep
        # scan in envs/go1_env.py).  The env batch is pre-split to
        # (..., 8, block // 8) HOST-side so every "scalar" op of the
        # in-kernel rebuild chain is a full-height VPU tile (Mosaic
        # cannot lower the sublane<->lane cast in-kernel).
        assert terrain is None or terrain.height.shape == (2, 2)
        em, n_t = None, None
        Npad = -(-N // block) * block
        P_ = model.cp_body.shape[0]
        radius = jnp.asarray(model.cp_radius, dtype=f32)
        rh_t = jnp.broadcast_to(radius[:, None], (P_, Npad))
        mu_t = pc.to_env_minor(0.5 * (dyn.friction[:, None] + 1.0), block)
        e_t = pc.to_env_minor(dyn.restitution[:, None], block)
        g_t = pc.to_env_minor(dyn.gravity, block)
        exact_inputs = (pc.to_env_minor(dyn.payload[:, None], block),
                        pc.to_env_minor(dyn.com_displacement, block))
    else:
        em, rh_t, mu_t, e_t, g_t, n_t = build_pallas_env_inputs(
            model, state, dyn, terrain, block)
        exact_inputs = None
    q_t = pc.to_env_minor(state.q, block)
    qd_t = pc.to_env_minor(state.qd, block)
    pos_t = pc.to_env_minor(state.base_pos, block)
    quat_t = pc.to_env_minor(state.base_quat, block)
    lin_t = pc.to_env_minor(state.base_lin_vel, block)
    ang_t = pc.to_env_minor(state.base_ang_vel, block)
    tgt_t = pc.to_env_minor(tgt_eff, block)          # (D, 12, Npad)
    strengths_t = pc.to_env_minor(strengths, block)

    if ctrl[0] == "P":
        _, kp_eff, kd_eff = ctrl
        ctrl_inputs = (pc.to_env_minor(kp_eff, block),
                       pc.to_env_minor(kd_eff, block))
    else:
        _, weights, hists = ctrl
        ctrl_inputs = tuple(weights) + tuple(
            pc.to_env_minor(h, block) for h in hists)

    vlim = jnp.concatenate([
        jnp.full((3,), params.max_base_ang_vel, f32),
        jnp.full((3,), params.max_base_lin_vel, f32),
        jnp.asarray(model.dof_vel_limit, dtype=f32)])[:, None]
    tlim = jnp.asarray(torque_limits, dtype=f32)[:, None]
    qlo = jnp.asarray(model.dof_lower, dtype=f32)[:, None]
    qhi = jnp.asarray(model.dof_upper, dtype=f32)[:, None]

    if exact:
        # host-side sublane split (see the exact branch above): batch
        # axis (..., Npad) -> (..., 8, Npad // 8); XLA does the relayout
        # outside the kernel, which Mosaic cannot express inside it
        def _sub(x):
            return x.reshape(x.shape[:-1] + (8, x.shape[-1] // 8))

        rh_t, mu_t, e_t, g_t = map(_sub, (rh_t, mu_t, e_t, g_t))
        exact_inputs = tuple(map(_sub, exact_inputs))
        q_t, qd_t, pos_t, quat_t, lin_t, ang_t, tgt_t, strengths_t = map(
            _sub, (q_t, qd_t, pos_t, quat_t, lin_t, ang_t, tgt_t,
                   strengths_t))
        if ctrl[0] == "P":
            ctrl_inputs = tuple(map(_sub, ctrl_inputs))
        else:
            ctrl_inputs = ctrl_inputs[:6] + tuple(
                map(_sub, ctrl_inputs[6:]))
        vlim, tlim, qlo, qhi = (x[..., None] for x in
                                (vlim, tlim, qlo, qhi))

    outs = pm.control_step_pallas(
        em, rh_t, mu_t, e_t, g_t, n_t,
        q_t, qd_t, pos_t, quat_t, lin_t, ang_t,
        tgt_t, strengths_t, ctrl_inputs,
        vlim, tlim, qlo, qhi, lam_in_t,
        model=model, control_type=ctrl[0],
        dt=params.dt, num_iters=params.num_contact_iters,
        warm_iters=(params.num_contact_iters_warm
                    if params.contact_warm_start and not exact else 0),
        relaxation=params.relaxation, baumgarte=params.contact_baumgarte,
        slop=params.contact_slop,
        max_depen=params.max_depenetration_velocity,
        bounce_thresh=params.bounce_threshold_velocity,
        contact=bool(params.contact_enabled),
        limit_stiffness=params.joint_limit_stiffness,
        limit_damping=params.joint_limit_damping,
        max_base_ang_vel=params.max_base_ang_vel,
        max_base_lin_vel=params.max_base_lin_vel,
        decimation=decimation,
        block=block // 8 if exact else block, interpret=interpret,
        exact_inputs=exact_inputs)
    if exact:
        # merge the sublane split back to (..., Npad) for the env layer
        outs = tuple(
            x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
            for x in outs)
    (q_o, qd_o, pos_o, quat_o, lin_o, ang_o, pcp_t, pcp_prev_t, lam_t,
     tau_o) = outs[:10]
    new_state = PhysicsState(
        base_pos=pc.from_env_minor(pos_o, N),
        base_quat=pc.from_env_minor(quat_o, N),
        base_lin_vel=pc.from_env_minor(lin_o, N),
        base_ang_vel=pc.from_env_minor(ang_o, N),
        q=pc.from_env_minor(q_o, N),
        qd=pc.from_env_minor(qd_o, N))
    torques = pc.from_env_minor(tau_o, N)
    hist = {}
    if ctrl[0] != "P":
        el, ell, vl, vll = (pc.from_env_minor(h, N) for h in outs[10:14])
        hist = dict(joint_pos_err_last=el, joint_pos_err_last_last=ell,
                    joint_vel_last=vl, joint_vel_last_last=vll)
    return new_state, lam_t, pcp_t, pcp_prev_t, torques, hist


def contact_report_from_lam_t(model: RobotModel, lam_t: jnp.ndarray,
                              dt: float, N: int) -> ContactInfo:
    """Materialize the report-body contact forces from env-minor impulses
    (P, 3, Npad) — called once per control step in the Pallas path."""
    from ..ops import pallas_contact as pc
    f32 = lam_t.dtype
    forces = pc.from_env_minor(lam_t, N) / dt            # (N, P, 3)
    rep_onehot = jnp.asarray(
        np.eye(model.num_report_bodies, dtype=np.float32)[model.cp_report_body],
        dtype=f32)
    seg = _einsum("pr,npi->nri", rep_onehot, forces)
    return ContactInfo(report_forces=seg,
                       foot_forces=forces[:, model.cp_is_foot, :])


def foot_state_from_pcp_t(model: RobotModel, p_cp_t: jnp.ndarray,
                          p_cp_prev_t: jnp.ndarray, dt: float, N: int):
    """Foot positions & velocities from the env-minor carried contact
    points of the last substep (Pallas path): positions are the foot rows
    of p_cp, velocities the backward difference the kernel advanced them
    with.  Returns ((N,4,3), (N,4,3)) in FL FR RL RR order."""
    from ..ops import pallas_contact as pc
    feet = np.nonzero(model.cp_is_foot)[0]
    p_foot_t = jnp.concatenate([p_cp_t[f:f + 1] for f in feet], axis=0)
    v_foot_t = jnp.concatenate(
        [(p_cp_t[f:f + 1] - p_cp_prev_t[f:f + 1]) / dt for f in feet], axis=0)
    return pc.from_env_minor(p_foot_t, N), pc.from_env_minor(v_foot_t, N)


# ---------------------------------------------------------------------------
# integration step
# ---------------------------------------------------------------------------


def physics_substep(
    model: RobotModel,
    params: SimParams,
    state: PhysicsState,
    joint_torques: jnp.ndarray,          # (N, 12)
    dyn: DynamicsParams,
    terrain: Terrain,
) -> tuple[PhysicsState, ContactInfo]:
    """One physics step at params.dt (called `decimation` times per ctrl step)."""
    f32 = state.base_pos.dtype
    N = state.base_pos.shape[0]
    dt = params.dt

    frames = forward_kinematics(model, state)
    ref = state.base_pos
    Sw, Sv = joint_twists(model, frames, ref)
    blk = inertia_blocks(model, frames, ref, dyn)
    gen_vel = jnp.concatenate(
        [state.base_ang_vel, state.base_lin_vel, state.qd], axis=-1
    )
    # NOTE ordering: twist rows are [rot(3), trans(3), joints] -> gen_vel is
    # [ang, lin, qd] internally; the public state keeps lin/ang split.
    Vw, Vv = body_twists(model, Sw, Sv, gen_vel)
    M = mass_matrix(model, Sw, Sv, blk)
    if params.armature:
        arm = jnp.concatenate(
            [jnp.zeros(6, f32), jnp.full((model.nj,), params.armature, f32)]
        )
        M = M + jnp.diag(arm)[None]
    M = M + 1e-7 * jnp.eye(model.nv, dtype=f32)[None]
    bias = bias_forces(model, Sw, Sv, Vw, Vv, blk, gen_vel, dyn.gravity)

    # joint limit one-sided springs + applied motor torques
    lo = jnp.asarray(model.dof_lower, dtype=f32)
    hi = jnp.asarray(model.dof_upper, dtype=f32)
    over_hi = jnp.maximum(state.q - hi, 0.0)
    under_lo = jnp.maximum(lo - state.q, 0.0)
    tau_lim = (
        params.joint_limit_stiffness * (under_lo - over_hi)
        - params.joint_limit_damping * ((over_hi > 0) | (under_lo > 0)) * state.qd
    )
    tau = jnp.concatenate(
        [jnp.zeros((N, 6), f32), joint_torques + tau_lim], axis=-1
    )

    # unconstrained velocity update — closed-form M^-1 (no sequential linalg
    # on TPU; see ops/linalg.py).  The velocity-product terms (RNEA bias +
    # the spatial->material w x v correction for the base point) are
    # integrated with a midpoint (RK2) evaluation: explicit Euler is
    # unconditionally unstable for the gyroscopic part (imaginary
    # eigenvalues — zero-torque tumbling gains ~6%/s energy at |w| = 5
    # rad/s and diverges past ~15 rad/s at dt = 5 ms), while the midpoint
    # update is near-conservative through 40 rad/s (runs/seed2_blowup).
    Minv = _mass_matrix_inverse(model, M)

    def qdd_of(gv, Vw_, Vv_):
        b = bias_forces(model, Sw, Sv, Vw_, Vv_, blk, gv, dyn.gravity)
        qdd = _einsum("nij,nj->ni", Minv, tau - b)
        # spatial -> material acceleration for the base point: the solved
        # linear component is the fixed-point (spatial) derivative; the
        # material particle at the reference adds w x v (Featherstone,
        # conventional vs spatial acc).
        return qdd.at[:, 3:6].add(jnp.cross(gv[:, :3], gv[:, 3:6]))

    qdd1 = qdd_of(gen_vel, Vw, Vv)
    gv_mid = gen_vel + (0.5 * dt) * qdd1
    Vw_m, Vv_m = body_twists(model, Sw, Sv, gv_mid)
    gen_vel_free = gen_vel + dt * qdd_of(gv_mid, Vw_m, Vv_m)

    # contact impulses on the post-free velocity (semi-implicit)
    if params.contact_enabled:
        dv, cp_forces, p_cp = _contact_solve(
            model, params, Minv, Sw, Sv, frames, ref, gen_vel_free, terrain,
            dyn, dt
        )
        gen_vel_new = gen_vel_free + dv
    else:
        P = model.cp_body.shape[0]
        cp_forces = jnp.zeros((N, P, 3), f32)
        gen_vel_new = gen_vel_free

    # clamp joint velocity to URDF limits (PhysX enforces maxVelocity)
    vlim = jnp.asarray(model.dof_vel_limit, dtype=f32)
    qd_new = jnp.clip(gen_vel_new[:, 6:], -vlim, vlim)
    ang_new = jnp.clip(gen_vel_new[:, :3], -params.max_base_ang_vel,
                       params.max_base_ang_vel)
    lin_new = jnp.clip(gen_vel_new[:, 3:6], -params.max_base_lin_vel,
                       params.max_base_lin_vel)

    # semi-implicit Euler position update
    base_pos = state.base_pos + dt * lin_new
    base_quat = qops.quat_integrate(state.base_quat, ang_new, dt)
    q_new = state.q + dt * qd_new

    new_state = PhysicsState(
        base_pos=base_pos,
        base_quat=base_quat,
        base_lin_vel=lin_new,
        base_ang_vel=ang_new,
        q=q_new,
        qd=qd_new,
    )

    # accumulate report-body contact forces (reference contact_forces tensor)
    # via one-hot matmul (scatter-add lowers terribly on TPU)
    rep_onehot = jnp.asarray(
        np.eye(model.num_report_bodies, dtype=np.float32)[model.cp_report_body],
        dtype=f32)                                        # (P, 17)
    seg = _einsum("pr,npi->nri", rep_onehot, cp_forces)
    foot_forces = cp_forces[:, model.cp_is_foot, :]
    return new_state, ContactInfo(report_forces=seg, foot_forces=foot_forces)


def foot_state_from_cache(model: RobotModel, cache: DynamicsCache,
                          state: PhysicsState, p_cp: jnp.ndarray):
    """Foot positions & velocities from the carried contact-point estimate
    and cached Jacobians — replaces a full FK + twist pass per control step
    in reuse mode (the foot contact points coincide with the reference's
    foot rigid-body positions: same body, same offset).  Returns
    ((N,4,3), (N,4,3)) in FL FR RL RR order."""
    f32 = state.base_pos.dtype
    foot_onehot = jnp.asarray(
        np.eye(model.cp_body.shape[0], dtype=np.float32)[model.cp_is_foot],
        dtype=f32)                                          # (4, P)
    p_foot = _einsum("fp,npi->nfi", foot_onehot, p_cp)
    delta = cache.ref - state.base_pos
    v_ref = state.base_lin_vel + jnp.cross(state.base_ang_vel, delta)
    gv = jnp.concatenate([state.base_ang_vel, v_ref, state.qd], axis=-1)
    J_feet = _einsum("fp,npiv->nfiv", foot_onehot, cache.J)
    v_foot = _einsum("nfiv,nv->nfi", J_feet, gv)
    return p_foot, v_foot


def foot_positions_velocities(model: RobotModel, state: PhysicsState):
    """World foot positions & velocities (reference rigid_body_state slices,
    legged_robot.py:112-115). Returns ((N,4,3), (N,4,3))."""
    frames = forward_kinematics(model, state)
    f32 = state.base_pos.dtype
    foot_onehot = jnp.asarray(
        np.eye(model.nb, dtype=np.float32)[model.foot_body], dtype=f32)
    Rb = _einsum("fb,nbij->nfij", foot_onehot, frames.R)
    pb = _einsum("fb,nbi->nfi", foot_onehot, frames.p)
    off = jnp.asarray(model.foot_offset, dtype=f32)
    p_foot = pb + _einsum("nfij,fj->nfi", Rb, off)
    # velocity = body twist at foot point
    gen_vel = jnp.concatenate(
        [state.base_ang_vel, state.base_lin_vel, state.qd], axis=-1
    )
    Sw, Sv = joint_twists(model, frames, state.base_pos)
    Vw, Vv = body_twists(model, Sw, Sv, gen_vel)   # about base ref
    w = _einsum("fb,nbk->nfk", foot_onehot, Vw)
    v = _einsum("fb,nbk->nfk", foot_onehot, Vv)
    r = p_foot - state.base_pos[:, None, :]
    v_foot = v + jnp.cross(w, r)
    return p_foot, v_foot
