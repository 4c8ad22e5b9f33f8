"""Run the REFERENCE sample-factory implementation (torch) on this box's MuJoCo.

Purpose: root-cause the HalfCheetah-v4 return-parity gap (our framework's
reference-parity recipe plateaus at ~1800 @ 10M vs the reference's published
6262 +/- 67, measured on mujoco<2.5; this box has mujoco 3.10 and zero egress,
so the pinned-version probe is not installable). This script answers the only
separable question available here: does the reference's OWN numerics, running
on THIS box's mujoco/gymnasium versions, also plateau?

 - If yes  -> the gap is a simulator/version artifact, not a framework bug.
 - If no   -> our framework has a real numerics deviation to bisect.

Method: the reference's Learner, ActorCritic, normalizers, trajectory tensor
schema (alloc_trajectory_tensors), action preprocessing, and env wrapper stack
(make_env_func_non_batched: same-step auto-reset, reward scale/clip) are used
verbatim from /root/reference (imported read-only with import stubs for
signal-slot-mp/colorlog in tools/refstubs). Only the outer synchronous
collection loop is ours, and it mirrors the reference's sync-mode recipe
exactly: 64 envs x rollout 64 = 4096 samples/iteration = batch_size 1024 x
num_batches_per_epoch 4, policy_version stamped at collection time
(reference sf_examples/mujoco/mujoco_params.py: async_rl=False).

Usage:
    python tools/probe_reference_halfcheetah.py --env=mujoco_halfcheetah \
        --seed=0 --train_for_env_steps=10000000 \
        --train_dir=/tmp/evidence --experiment=ref_probe_halfcheetah
"""

import argparse
import collections
import json
import os
import sys
import time

os.environ.setdefault("PYTORCH_JIT", "0")  # reference jit-scripts kernels; not needed for the probe

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools", "refstubs"))
sys.path.insert(0, "/root/reference")

import numpy as np
import torch


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="mujoco_halfcheetah")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train_for_env_steps", type=int, default=10_000_000)
    ap.add_argument("--train_dir", default="/tmp/evidence")
    ap.add_argument("--experiment", default="ref_probe_halfcheetah")
    ap.add_argument(
        "--init_from_tpu_checkpoint",
        default=None,
        help="Transplant probe: load a sample_factory_tpu msgpack checkpoint's policy weights "
        "+ normalizer state into the reference torch model before training (fresh optimizer/LR). "
        "Answers: can the reference's update dynamics escape OUR trot-stuck policy?",
    )
    args = ap.parse_args()

    from sample_factory.algo.learning.learner import Learner
    from sample_factory.algo.utils.env_info import extract_env_info
    from sample_factory.algo.utils.make_env import make_env_func_non_batched
    from sample_factory.algo.utils.model_sharing import ParameterServer
    from sample_factory.algo.utils.rl_utils import prepare_and_normalize_obs
    from sample_factory.algo.utils.shared_buffers import alloc_trajectory_tensors
    from sample_factory.algo.sampling.batched_sampling import preprocess_actions
    from sample_factory.model.model_utils import get_rnn_size
    from sample_factory.utils.attr_dict import AttrDict
    from sample_factory.utils.typing import Config  # noqa: F401  (sanity: full import chain works)
    from sf_examples.mujoco.train_mujoco import parse_mujoco_cfg, register_mujoco_components

    register_mujoco_components()
    cfg = parse_mujoco_cfg(
        argv=[
            f"--env={args.env}",
            f"--experiment={args.experiment}",
            f"--train_dir={args.train_dir}",
            f"--seed={args.seed}",
            f"--train_for_env_steps={args.train_for_env_steps}",
            "--device=cpu",
        ]
    )

    num_envs = cfg.num_workers * cfg.num_envs_per_worker  # 8 x 8 = 64, reference recipe
    rollout = cfg.rollout  # 64

    envs = []
    for i in range(num_envs):
        env_config = AttrDict(worker_index=i, vector_index=0, env_id=i)
        envs.append(make_env_func_non_batched(cfg, env_config))

    env_info = extract_env_info(envs[0], cfg)

    policy_versions = torch.zeros([1], dtype=torch.int32)
    param_server = ParameterServer(0, policy_versions, serial_mode=True)
    learner = Learner(cfg, env_info, policy_versions, 0, param_server)
    learner.init()
    actor_critic = learner.actor_critic

    if args.init_from_tpu_checkpoint:
        import flax.serialization as ser

        tree = ser.msgpack_restore(open(args.init_from_tpu_checkpoint, "rb").read())
        ts = tree["train_state"]
        p = ts["params"]["params"]

        def t(a):
            return torch.from_numpy(np.ascontiguousarray(a))

        sd = actor_critic.state_dict()
        sd["encoder.encoders.obs.mlp_head.0.weight"] = t(p["encoder"]["enc_obs"]["Dense_0"]["kernel"].T)
        sd["encoder.encoders.obs.mlp_head.0.bias"] = t(p["encoder"]["enc_obs"]["Dense_0"]["bias"])
        sd["encoder.encoders.obs.mlp_head.2.weight"] = t(p["encoder"]["enc_obs"]["Dense_1"]["kernel"].T)
        sd["encoder.encoders.obs.mlp_head.2.bias"] = t(p["encoder"]["enc_obs"]["Dense_1"]["bias"])
        sd["critic_linear.weight"] = t(p["critic_linear"]["kernel"].T)
        sd["critic_linear.bias"] = t(p["critic_linear"]["bias"])
        sd["action_parameterization.distribution_linear.weight"] = t(p["action_parameterization"]["Dense_0"]["kernel"].T)
        sd["action_parameterization.distribution_linear.bias"] = t(p["action_parameterization"]["Dense_0"]["bias"])
        sd["action_parameterization.learned_stddev"] = t(p["action_parameterization"]["learned_stddev"])
        sd["obs_normalizer.running_mean_std.running_mean_std.obs.running_mean"] = t(ts["obs_rms"]["obs"]["running_mean"])
        sd["obs_normalizer.running_mean_std.running_mean_std.obs.running_var"] = t(ts["obs_rms"]["obs"]["running_var"])
        sd["obs_normalizer.running_mean_std.running_mean_std.obs.count"] = t(
            np.asarray([ts["obs_rms"]["obs"]["count"]], dtype=np.float32)
        )
        sd["returns_normalizer.running_mean"] = t(ts["returns_rms"]["running_mean"])
        sd["returns_normalizer.running_var"] = t(ts["returns_rms"]["running_var"])
        sd["returns_normalizer.count"] = t(np.asarray([ts["returns_rms"]["count"]], dtype=np.float32))
        actor_critic.load_state_dict(sd)
        print(f"[ref-probe] transplanted weights + normalizer state from {args.init_from_tpu_checkpoint}")

    rnn_size = get_rnn_size(cfg)
    traj = alloc_trajectory_tensors(env_info, num_envs, rollout, rnn_size, torch.device("cpu"), share=False)

    # reset all envs (per-env seeds, same spirit as non_batched_sampling.py:430)
    obs_np = np.zeros((num_envs,) + env_info.obs_space["obs"].shape, dtype=np.float64)
    for i, e in enumerate(envs):
        obs_list, _ = e.reset(seed=args.seed * 100000 + i)
        obs_np[i] = obs_list[0]["obs"]
    rnn_states = torch.zeros((num_envs, rnn_size), dtype=torch.float32)

    episode_returns = np.zeros(num_envs)
    episode_lens = np.zeros(num_envs, dtype=np.int64)
    recent_returns = collections.deque(maxlen=100)
    recent_lens = collections.deque(maxlen=100)

    out_path = os.path.join(args.train_dir, args.experiment, "summaries.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    out_f = open(out_path, "a")

    env_steps = 0
    start = time.time()
    it = 0
    while env_steps < args.train_for_env_steps:
        for t in range(rollout):
            obs_t = torch.from_numpy(obs_np)
            traj["obs"]["obs"][:, t] = obs_t
            traj["rnn_states"][:, t] = rnn_states

            with torch.no_grad():
                actor_critic.eval()  # match inference_worker.py:322 — no normalizer updates during sampling
                normalized_obs = prepare_and_normalize_obs(actor_critic, {"obs": obs_t})
                out = actor_critic(normalized_obs, rnn_states)

            traj["actions"][:, t] = out["actions"]
            traj["action_logits"][:, t] = out["action_logits"]
            traj["log_prob_actions"][:, t] = out["log_prob_actions"]
            traj["values"][:, t] = out["values"]
            traj["policy_version"][:, t] = learner.train_step
            traj["policy_id"][:, t] = 0
            rnn_states = out["new_rnn_states"]

            actions_np = preprocess_actions(env_info, out["actions"])  # no clipping, matches reference
            for i, e in enumerate(envs):
                obs_list, rews, terms, truncs, infos = e.step([actions_np[i]])
                r, term, trunc = float(rews[0]), bool(terms[0]), bool(truncs[0])
                episode_returns[i] += r  # raw reward, matches non_batched_sampling.py:510
                episode_lens[i] += 1
                done = term or trunc
                r_proc = np.clip(r * cfg.reward_scale, -cfg.reward_clip, cfg.reward_clip)
                traj["rewards"][i, t] = float(r_proc)
                traj["dones"][i, t] = done
                traj["time_outs"][i, t] = trunc
                obs_np[i] = obs_list[0]["obs"]  # same-step auto-reset obs on done (make_env.py:92-94)
                if done:
                    recent_returns.append(episode_returns[i])
                    recent_lens.append(episode_lens[i])
                    episode_returns[i] = 0.0
                    episode_lens[i] = 0
                    rnn_states[i] = 0.0  # update_rnn_state on done

        # T+1 step for bootstrap (values[:, -1] is computed inside learner._prepare_batch)
        traj["obs"]["obs"][:, rollout] = torch.from_numpy(obs_np)
        traj["rnn_states"][:, rollout] = rnn_states

        stats = learner.train(traj)
        env_steps += num_envs * rollout
        it += 1

        if it % 10 == 0:
            train_stats = (stats or {}).get("train", {})
            rec = {
                "env_steps": env_steps,
                "time": time.time(),
                "fps": env_steps / (time.time() - start),
                "reward": float(np.mean(recent_returns)) if recent_returns else float("nan"),
                "episode_len": float(np.mean(recent_lens)) if recent_lens else float("nan"),
            }
            for k in ("kl_divergence", "fraction_clipped", "entropy", "actual_lr", "value_loss", "policy_loss"):
                if k in train_stats:
                    rec[f"train/{k}"] = float(np.mean(train_stats[k]))
            out_f.write(json.dumps(rec) + "\n")
            out_f.flush()
            print(
                f"[ref-probe] steps={env_steps} reward={rec['reward']:.1f} "
                f"fps={rec['fps']:.0f} kl={rec.get('train/kl_divergence', float('nan')):.4f}",
                flush=True,
            )

    out_f.close()
    print(f"[ref-probe] DONE: {env_steps} steps, final avg reward "
          f"{np.mean(recent_returns) if recent_returns else float('nan'):.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
