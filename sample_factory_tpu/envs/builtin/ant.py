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
        # perpendicular to the leg diagonal (tighter limit than the hip: the
        # ankle carries the torso's weight, so its free range bounds how far
        # the stance can crouch)
        perp = np.cross([0.0, 0.0, 1.0], diag[i])
        joints.append(
            dict(
                parent=upper_idx,
                child=lower_idx,
                anchor_p=(diag[i] * (upper_len / 2)).tolist(),
                anchor_c=(-down_out[i] * (lower_len / 2)).tolist(),
                axis=(perp / np.linalg.norm(perp)).tolist(),
                limit=np.pi / 6,
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

    # rest direction of each child link in the PARENT frame: hip joints swing
    # the upper leg (rest = horizontal diagonal), ankles flex the lower leg
    # (rest = 45 deg down-outward). Joint angles are measured as the deviation
    # of the current link direction from this rest direction about the hinge
    # axis. The ankle rest is PRELOADED ~13 deg further down ("muscle tone"):
    # the stance leverage is such that gravity flexes each ankle by
    # ~asin(gravity_torque/k_rest) — preloading by that angle makes the
    # standing pose (not a bellyflop crouch) the loaded equilibrium.
    def _rodrigues(axis, theta, v):
        axis = axis / np.linalg.norm(axis)
        return (
            v * np.cos(theta)
            + np.cross(axis, v) * np.sin(theta)
            + axis * np.dot(axis, v) * (1 - np.cos(theta))
        )

    preload = np.arcsin(0.225)  # ~= gravity ankle torque (~4.5 N*m) / k_rest (20)
    jrest_p = []
    for i in range(4):
        jrest_p.append(diag[i].tolist())  # hip
        ax = np.cross([0.0, 0.0, 1.0], diag[i])
        ax /= np.linalg.norm(ax)
        cand_a = _rodrigues(ax, preload, down_out[i])
        cand_b = _rodrigues(ax, -preload, down_out[i])
        jrest_p.append((cand_a if cand_a[2] < cand_b[2] else cand_b).tolist())  # ankle, foot-down preload

    geo = dict(
        body_pos=np.asarray([b["pos"] for b in bodies], np.float32),
        body_mass=np.asarray([b["mass"] for b in bodies], np.float32),
        # isotropic inertia (solid-sphere approximation with a fattened radius
        # floor; keeps the angular update diagonal and the penalty
        # articulation's angular stiffness modes inside the integrator's
        # stability region — a "minimal physics" simplification)
        body_inertia=np.asarray(
            [0.4 * b["mass"] * max(b["radius"], 0.16) ** 2 for b in bodies], np.float32
        ),
        jp=np.asarray([j["parent"] for j in joints], np.int32),
        jc=np.asarray([j["child"] for j in joints], np.int32),
        # one-hot accumulation matrices: force/torque contributions sum onto
        # bodies via dense [NB, NJ/NC] x [NJ/NC, 3] matmuls instead of
        # scatter-adds — scatters are slow to compile and run on XLA backends
        # while tiny matmuls fuse cleanly (and hit the MXU when vmapped)
        acc_jp=np.eye(9, dtype=np.float32)[:, [j["parent"] for j in joints]],
        acc_jc=np.eye(9, dtype=np.float32)[:, [j["child"] for j in joints]],
        acc_cb=np.eye(9, dtype=np.float32)[:, col_body],
        ja_p=np.asarray([j["anchor_p"] for j in joints], np.float32),
        ja_c=np.asarray([j["anchor_c"] for j in joints], np.float32),
        jaxis=np.asarray([j["axis"] for j in joints], np.float32),
        jrest_p=np.asarray(jrest_p, np.float32),
        # limits stored as sin(limit): compared against the sine of the
        # deviation angle (small-angle proxy, exact at the rest pose)
        jlimit_sin=np.asarray([np.sin(j["limit"]) for j in joints], np.float32),
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

    def __init__(self, episode_len: int = 1000, substeps: int = 16, ctrl_hz: float = 60.0):
        self.episode_len = episode_len
        self.substeps = substeps
        self.dt = 1.0 / (ctrl_hz * substeps)
        g = _build_geometry()
        self.geo = {k: jnp.asarray(v) for k, v in g.items()}
        self.obs_space = make_dict_spec({"obs": Box((59,), -np.inf, np.inf)})
        self.action_space = Box((self.NJ,), -1.0, 1.0)
        # physics gains (penalty articulation), tuned so every spring-damper
        # mode satisfies omega*dt < ~0.25 and gamma*dt < ~0.5 at the default
        # dt = 1/960 (the semi-implicit-Euler stability budget; the binding
        # mode is the ANGULAR joint stiffness k_joint*arm^2/inertia)
        # k_axis is the articulation's structural rigidity (it resists any
        # relative rotation off the hinge axis — e.g. the upper legs tilting
        # under the torso's weight); it must dominate gravity torques (~8 N*m)
        self.k_joint, self.c_joint = 3000.0, 30.0
        self.k_axis, self.c_axis = 150.0, 1.0
        self.k_contact, self.c_contact = 4000.0, 30.0
        self.friction_mu = 0.9
        self.gear = 6.0
        self.k_limit = 150.0
        # posture spring toward the rest pose (muscle tone; without it the
        # penalty articulation sags at the free hinge DoF until the soft
        # limits engage and the torso sinks into a crouch that kills the
        # locomotion geometry). Sized so gravity's ankle torque (~2.5 N*m)
        # deflects onto the preloaded rest pose (see _build_geometry) and the
        # actuators (gear 6) retain ~+-17 deg authority around the stance
        self.k_rest = 20.0
        self.reward_shaping = {"forward_w": 1.0, "ctrl_cost_w": 0.5, "alive_bonus": 0.5}

    # --------------------------------------------------------------- dynamics

    def _substep(self, pos, quat, vel, ang, torque_act):
        """One semi-implicit Euler step. All arrays [NB, ...] for one env."""
        geo = self.geo
        gravity = jnp.concatenate(
            [jnp.zeros((self.NB, 2)), (-9.81 * geo["body_mass"])[:, None]], axis=-1
        )

        # --- joints: ball-socket spring-damper + hinge alignment + actuation
        jp, jc = geo["jp"], geo["jc"]
        rp = quat_rotate(quat[jp], geo["ja_p"])  # world anchor offsets
        rc = quat_rotate(quat[jc], geo["ja_c"])
        wp = pos[jp] + rp
        wc = pos[jc] + rc
        vp = vel[jp] + jnp.cross(ang[jp], rp)
        vc = vel[jc] + jnp.cross(ang[jc], rc)
        f_j = self.k_joint * (wc - wp) + self.c_joint * (vc - vp)  # pulls anchors together
        force = gravity + (geo["acc_jp"] - geo["acc_jc"]) @ f_j
        torque = geo["acc_jp"] @ jnp.cross(rp, f_j) + geo["acc_jc"] @ jnp.cross(rc, -f_j)

        # hinge: keep child axis aligned with parent axis; damp relative spin
        ax_p = quat_rotate(quat[jp], geo["jaxis"])
        ax_c = quat_rotate(quat[jc], geo["jaxis"])
        t_align = self.k_axis * jnp.cross(ax_c, ax_p)
        rel_w = ang[jc] - ang[jp]
        t_damp = self.c_axis * rel_w
        # joint deviation about the hinge axis, measured against the REST link
        # direction carried in the parent frame (exactly 0 at the rest pose):
        # sin(angle) = (d_rest x d_link) . axis
        d_link = quat_rotate(quat[jc], -geo["ja_c"])
        d_link = d_link / (jnp.linalg.norm(d_link, axis=-1, keepdims=True) + 1e-6)
        d_rest = quat_rotate(quat[jp], geo["jrest_p"])
        sin_angle = jnp.sum(jnp.cross(d_rest, d_link) * ax_p, axis=-1)
        over = jnp.clip(jnp.abs(sin_angle) - geo["jlimit_sin"], 0.0, None) * jnp.sign(sin_angle)
        t_limit = -(self.k_limit * over + self.k_rest * sin_angle)[:, None] * ax_p
        t_act = (torque_act * self.gear)[:, None] * ax_p
        t_child = t_align - t_damp + t_act + t_limit
        torque = torque + (geo["acc_jc"] - geo["acc_jp"]) @ t_child

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
        force = force + geo["acc_cb"] @ f_c
        torque = torque + geo["acc_cb"] @ jnp.cross(off_w, f_c)

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
        # per-joint: rest-relative bend (cos of deviation, 1 at rest) and
        # signed deviation about the hinge axis (sin, 0 at rest), plus the
        # relative angular velocity
        d_link = quat_rotate(quat[jc], -geo["ja_c"])
        d_link = d_link / (jnp.linalg.norm(d_link, axis=-1, keepdims=True) + 1e-6)
        d_rest = quat_rotate(quat[jp], geo["jrest_p"])
        bend = jnp.sum(d_rest * d_link, axis=-1)
        twist = jnp.sum(jnp.cross(d_rest, d_link) * ax_p, axis=-1)
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
                jnp.zeros((4,)),  # padding to 59 (reserved)
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
        unhealthy = (z < 0.20) | (z > 1.2) | (quat[0, 0] < 0.35)  # fallen or flipped
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
    # "ant_short" = truncates at 150 control steps: keeps CI learning tests
    # and benchmarks that only need steady-state stepping cheap
    if full_env_name == "ant_short":
        return AntEnv(episode_len=150)
    return AntEnv()


def register_ant(env_name: str = "ant") -> None:
    from sample_factory_tpu.envs.env_utils import register_env

    register_env(env_name, make_ant_env)
