"""sample_factory_tpu: a TPU-native rebuild of Sample Factory (APPO).

Brand-new architecture for TPU hardware: instead of the reference's multiprocess
rollout/inference/learner workers communicating over shared-memory queues
(see reference sample_factory/algo/runners/runner.py), the hot path is a single
jitted XLA program per host: thousands of envs step in lockstep under `vmap` +
`lax.scan`, trajectories land in device-resident pytrees, and the PPO learner
runs as a fused XLA update step with gradient `psum` over the device mesh.
"""

__version__ = "0.1.0"
