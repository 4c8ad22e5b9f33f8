"""AntEnv: an on-device rigid-body quadruped with real physics.

The physics term for the IsaacGym-Ant benchmark comparison (reference
`sample_factory/benchmarking/benchmarking_isaacgym_ant.txt`: PhysX Ant, 4096
env agents, 204K FPS on 1 GPU). This is NOT a port of any engine: it is a
minimal maximal-coordinate rigid-body simulator written directly in JAX so the
whole env is one vmappable pure function (SURVEY.md §7 stage 4 — env physics
and policy fused into a single XLA program).

Model (the classic MuJoCo/IsaacGym ant topology):
  - 9 rigid bodies: spherical torso + 4 legs x (upper, lower) capsule links,
    each with position, quaternion, linear and angular velocity
  - 8 joints: per leg a hip (swing about the vertical axis) and an ankle
    (flexion about the horizontal axis perpendicular to the leg), modeled as
    stiff ball-socket spring-dampers (anchor coincidence) plus hinge-axis
    alignment torques — penalty-based articulation, no constraint solver
  - 8 torque actuators about the hinge axes, joint-angle soft limits
  - ground contact: per-body collision spheres with a normal spring-damper
    and Coulomb-clamped viscous tangential friction
  - semi-implicit Euler at dt = 1/(60*substeps), `substeps` inner steps per
    control step (lax.fori_loop), quaternion integration + renormalization

Reward/termination follow the Ant convention: forward (+x) torso velocity
+ alive bonus - ctrl cost - contact cost; unhealthy (torso z out of range)
terminates, 1000 control steps truncate.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sample_factory_tpu.envs.device_env import DeviceEnv
from sample_factory_tpu.envs.spaces import Box, make_dict_spec

# ----------------------------------------------------------- quaternion utils
# scalar-first quaternions [w, x, y, z]


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q. Shapes [..., 4], [..., 3]."""
    w, xyz = q[..., :1], q[..., 1:]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_integrate(q, omega, dt):
    """q <- normalize(q + dt/2 * omega*q) for world-frame angular velocity."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
    dq = 0.5 * jnp.stack(
        [
            -ox * x - oy * y - oz * z,
            ox * w + oy * z - oz * y,
            oy * w + oz * x - ox * z,
            oz * w + ox * y - oy * x,
        ],
        axis=-1,
    )
    q = q + dt * dq
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ------------------------------------------------------------------- geometry


def _build_geometry():
    """Constant ant geometry (computed in numpy once at construction).

    Legs point along the 4 horizontal diagonals. Upper legs are horizontal,
    lower legs slope down-outward at 45 deg so the feet rest on the ground at
    the initial torso height.
    """
    torso_r = 0.25
    upper_len = 0.35
    lower_len = 0.45
    diag = np.asarray([[1, 1, 0], [-1, 1, 0], [-1, -1, 0], [1, -1, 0]], np.float64)
    diag /= np.linalg.norm(diag, axis=1, keepdims=True)
    down_out = diag * np.cos(np.pi / 4) + np.asarray([0.0, 0.0, -np.sin(np.pi / 4)])

    torso_z = lower_len * np.sin(np.pi / 4) + 0.08  # feet just at the ground
    bodies = [dict(pos=[0.0, 0.0, torso_z], mass=3.0, radius=torso_r)]
    joints = []
    for i in range(4):
        hip_anchor = diag[i] * torso_r  # on the torso surface (torso frame)
        upper_center = np.asarray([0.0, 0.0, torso_z]) + hip_anchor + diag[i] * (upper_len / 2)
        bodies.append(dict(pos=upper_center.tolist(), mass=0.5, radius=0.06))
        knee_world = np.asarray([0.0, 0.0, torso_z]) + hip_anchor + diag[i] * upper_len
        lower_center = knee_world + down_out[i] * (lower_len / 2)
        bodies.append(dict(pos=lower_center.tolist(), mass=0.4, radius=0.05))

        upper_idx, lower_idx = 1 + 2 * i, 2 + 2 * i
        # hip: torso <-> upper, swings about the vertical axis
        joints.append(
            dict(
                parent=0,
                child=upper_idx,
                anchor_p=hip_anchor.tolist(),  # parent-frame
                anchor_c=(-diag[i] * (upper_len / 2)).tolist(),  # child-frame
                axis=[0.0, 0.0, 1.0],
                limit=np.pi / 5,
            )
        )
        # ankle: upper <-> lower, flexes about the horizontal axis
        # perpendicular to the leg diagonal
        perp = np.cross([0.0, 0.0, 1.0], diag[i])
        joints.append(
            dict(
                parent=upper_idx,
                child=lower_idx,
                anchor_p=(diag[i] * (upper_len / 2)).tolist(),
                anchor_c=(-down_out[i] * (lower_len / 2)).tolist(),
                axis=(perp / np.linalg.norm(perp)).tolist(),
                limit=np.pi / 4,
            )
        )

    # collision spheres: torso + both capsule endpoints of every link
    col_body, col_off, col_r = [0], [[0.0, 0.0, 0.0]], [torso_r]
    for i in range(4):
        upper_idx, lower_idx = 1 + 2 * i, 2 + 2 * i
        col_body += [upper_idx, upper_idx, lower_idx, lower_idx]
        col_off += [
            (-diag[i] * (upper_len / 2)).tolist(),
            (diag[i] * (upper_len / 2)).tolist(),
            (-down_out[i] * (lower_len / 2)).tolist(),
            (down_out[i] * (lower_len / 2)).tolist(),
        ]
        col_r += [0.06, 0.06, 0.05, 0.05]

    geo = dict(
        body_pos=np.asarray([b["pos"] for b in bodies], np.float32),
        body_mass=np.asarray([b["mass"] for b in bodies], np.float32),
        # isotropic inertia (solid-sphere approximation; keeps the angular
        # update diagonal and the integrator robust — a "minimal physics"
        # simplification, not an engine bug)
        body_inertia=np.asarray(
            [0.4 * b["mass"] * max(b["radius"], 0.12) ** 2 for b in bodies], np.float32
        ),
        jp=np.asarray([j["parent"] for j in joints], np.int32),
        jc=np.asarray([j["child"] for j in joints], np.int32),
        ja_p=np.asarray([j["anchor_p"] for j in joints], np.float32),
        ja_c=np.asarray([j["anchor_c"] for j in joints], np.float32),
        jaxis=np.asarray([j["axis"] for j in joints], np.float32),
        jlimit=np.asarray([j["limit"] for j in joints], np.float32),
        col_body=np.asarray(col_body, np.int32),
        col_off=np.asarray(col_off, np.float32),
        col_r=np.asarray(col_r, np.float32),
    )
    return geo


class AntEnv(DeviceEnv):
    """On-device ant. Obs (59,): torso z + torso quat + torso lin/ang vel +
    per-joint [angle about hinge, relative angular velocity (3)] + per-foot
    contact flag. Actions (8,): actuator torques in [-1, 1]."""

    NB = 9  # bodies
    NJ = 8  # joints

    def __init__(self, episode_len: int = 1000, substeps: int = 8, ctrl_hz: float = 60.0):
        self.episode_len = episode_len
        self.substeps = substeps
        self.dt = 1.0 / (ctrl_hz * substeps)
        g = _build_geometry()
        self.geo = {k: jnp.asarray(v) for k, v in g.items()}
        self.obs_space = make_dict_spec({"obs": Box((59,), -np.inf, np.inf)})
        self.action_space = Box((self.NJ,), -1.0, 1.0)
        # physics gains (penalty articulation)
        self.k_joint, self.c_joint = 4000.0, 40.0
        self.k_axis, self.c_axis = 60.0, 1.0
        self.k_contact, self.c_contact = 6000.0, 30.0
        self.friction_mu = 0.9
        self.gear = 8.0
        self.k_limit = 40.0
        self.reward_shaping = {"forward_w": 1.0, "ctrl_cost_w": 0.5, "alive_bonus": 0.5}

    # --------------------------------------------------------------- dynamics

    def _substep(self, pos, quat, vel, ang, torque_act):
        """One semi-implicit Euler step. All arrays [NB, ...] for one env."""
        geo = self.geo
        force = jnp.zeros((self.NB, 3)).at[:, 2].add(-9.81 * geo["body_mass"])
        torque = jnp.zeros((self.NB, 3))

        # --- joints: ball-socket spring-damper + hinge alignment + actuation
        jp, jc = geo["jp"], geo["jc"]
        rp = quat_rotate(quat[jp], geo["ja_p"])  # world anchor offsets
        rc = quat_rotate(quat[jc], geo["ja_c"])
        wp = pos[jp] + rp
        wc = pos[jc] + rc
        vp = vel[jp] + jnp.cross(ang[jp], rp)
        vc = vel[jc] + jnp.cross(ang[jc], rc)
        f_j = self.k_joint * (wc - wp) + self.c_joint * (vc - vp)  # pulls anchors together
        force = force.at[jp].add(f_j).at[jc].add(-f_j)
        torque = torque.at[jp].add(jnp.cross(rp, f_j)).at[jc].add(jnp.cross(rc, -f_j))

        # hinge: keep child axis aligned with parent axis; damp relative spin
        ax_p = quat_rotate(quat[jp], geo["jaxis"])
        ax_c = quat_rotate(quat[jc], geo["jaxis"])
        t_align = self.k_axis * jnp.cross(ax_c, ax_p)
        rel_w = ang[jc] - ang[jp]
        t_damp = self.c_axis * rel_w
        # joint angle about the hinge axis (for soft limits): signed angle of
        # the child's twist relative to the parent, approximated by the
        # projection of the relative rotation onto the axis
        qrel_vec = quat_rotate(quat[jc], geo["ja_c"]) - quat_rotate(quat[jp], -geo["ja_p"])
        angle = jnp.sum(jnp.cross(
            quat_rotate(quat[jp], geo["ja_p"]) / (jnp.linalg.norm(geo["ja_p"], axis=-1, keepdims=True) + 1e-6),
            quat_rotate(quat[jc], -geo["ja_c"]) / (jnp.linalg.norm(geo["ja_c"], axis=-1, keepdims=True) + 1e-6),
        ) * ax_p, axis=-1)
        over = jnp.clip(jnp.abs(angle) - geo["jlimit"], 0.0, None) * jnp.sign(angle)
        t_limit = -self.k_limit * over[:, None] * ax_p
        t_act = (torque_act * self.gear)[:, None] * ax_p
        t_child = t_align - t_damp + t_act + t_limit
        torque = torque.at[jc].add(t_child).at[jp].add(-t_child)
        del qrel_vec

        # --- ground contact (z = 0 plane) on collision spheres
        cb = geo["col_body"]
        off_w = quat_rotate(quat[cb], geo["col_off"])
        cpos = pos[cb] + off_w
        cvel = vel[cb] + jnp.cross(ang[cb], off_w)
        depth = geo["col_r"] - cpos[:, 2]
        in_contact = depth > 0.0
        fn = jnp.clip(self.k_contact * depth - self.c_contact * cvel[:, 2], 0.0, None) * in_contact
        vt = cvel.at[:, 2].set(0.0)
        vt_norm = jnp.linalg.norm(vt, axis=-1, keepdims=True) + 1e-6
        ft_mag = jnp.minimum(self.friction_mu * fn, 60.0 * vt_norm[:, 0])
        f_c = jnp.concatenate([-ft_mag[:, None] * vt[:, :2] / vt_norm, fn[:, None]], axis=-1)
        force = force.at[cb].add(f_c)
        torque = torque.at[cb].add(jnp.cross(off_w, f_c))

        # --- integrate (semi-implicit Euler, isotropic inertia)
        vel = vel + self.dt * force / geo["body_mass"][:, None]
        ang = ang + self.dt * torque / geo["body_inertia"][:, None]
        # mild global angular damping for numerical robustness
        ang = ang * (1.0 - 0.02 * self.dt * 60.0)
        pos = pos + self.dt * vel
        quat = quat_integrate(quat, ang, self.dt)
        return pos, quat, vel, ang, (fn, in_contact)

    def _obs(self, pos, quat, vel, ang, contact_fn):
        geo = self.geo
        jp, jc = geo["jp"], geo["jc"]
        ax_p = quat_rotate(quat[jp], geo["jaxis"])
        # per-joint: bend angle proxy (dot of the two link directions) and
        # relative angular velocity
        dir_p = quat_rotate(quat[jp], geo["ja_p"])
        dir_c = quat_rotate(quat[jc], -geo["ja_c"])
        bend = jnp.sum(dir_p * dir_c, axis=-1) / (
            jnp.linalg.norm(dir_p, axis=-1) * jnp.linalg.norm(dir_c, axis=-1) + 1e-6
        )
        twist = jnp.sum(jnp.cross(dir_p, dir_c) * ax_p, axis=-1)
        rel_w = ang[jc] - ang[jp]
        feet_fn = contact_fn[3::4]  # lower-leg outer endpoints = the 4 feet
        return jnp.concatenate(
            [
                pos[0, 2:3],  # torso height
                quat[0],  # torso orientation
                vel[0],  # torso linear velocity
                ang[0],  # torso angular velocity
                bend,  # 8
                twist,  # 8
                rel_w.reshape(-1),  # 24
                jnp.tanh(feet_fn / 100.0),  # 4 foot-contact signals
                jnp.zeros((3,)),  # padding to 59 (reserved)
            ]
        ).astype(jnp.float32)

    # ---------------------------------------------------------------- env API

    def reset(self, key):
        geo = self.geo
        k1, k2 = jax.random.split(key)
        pos = geo["body_pos"] + jax.random.uniform(k1, (self.NB, 3), minval=-0.01, maxval=0.01)
        quat = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (self.NB, 1))
        vel = jax.random.uniform(k2, (self.NB, 3), minval=-0.05, maxval=0.05)
        ang = jnp.zeros((self.NB, 3))
        state = dict(pos=pos, quat=quat, vel=vel, ang=ang, steps=jnp.zeros((), jnp.int32))
        fn0 = jnp.zeros((self.geo["col_body"].shape[0],))
        return {"obs": self._obs(pos, quat, vel, ang, fn0)}, state

    def step(self, key, state, action):
        action = jnp.clip(action.astype(jnp.float32), -1.0, 1.0)

        def body(_, carry):
            pos, quat, vel, ang, _ = carry
            pos, quat, vel, ang, (fn, _) = self._substep(pos, quat, vel, ang, action)
            return pos, quat, vel, ang, fn

        fn0 = jnp.zeros((self.geo["col_body"].shape[0],))
        pos, quat, vel, ang, fn = jax.lax.fori_loop(
            0, self.substeps, body, (state["pos"], state["quat"], state["vel"], state["ang"], fn0)
        )
        steps = state["steps"] + 1

        forward_v = vel[0, 0]
        ctrl_cost = jnp.sum(jnp.square(action))
        sh = self.reward_shaping
        reward = sh["forward_w"] * forward_v + sh["alive_bonus"] - sh["ctrl_cost_w"] * 0.1 * ctrl_cost

        z = pos[0, 2]
        unhealthy = (z < 0.23) | (z > 1.2) | (quat[0, 0] < 0.35)  # fallen or flipped
        terminated = unhealthy
        truncated = (~terminated) & (steps >= self.episode_len)
        new_state = dict(pos=pos, quat=quat, vel=vel, ang=ang, steps=steps)
        return (
            {"obs": self._obs(pos, quat, vel, ang, fn)},
            new_state,
            reward.astype(jnp.float32),
            terminated,
            truncated,
            {},
        )


def make_ant_env(full_env_name: str, cfg=None, env_config=None, render_mode=None) -> AntEnv:
    return AntEnv()


def register_ant(env_name: str = "ant") -> None:
    from sample_factory_tpu.envs.env_utils import register_env

    register_env(env_name, make_ant_env)
