"""Running mean/std normalization as functional pytree state.

Parity: reference `sample_factory/algo/utils/running_mean_std.py` (Welford
parallel-moments merge :50-62, normalize/denormalize with clip :64-110, dict
variant :113-137). Fresh JAX implementation: state is an immutable pytree
updated by pure functions, so it can live inside jitted train steps and be
sharded/replicated like any other state.

Deviation from the reference: accumulators are float32, not float64 — f64 is
emulated (slow) on TPU. The parallel merge form is numerically stable; count
saturates gracefully in f32 for realistic step budgets.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

NORM_EPS = 1e-5
DEFAULT_CLIP = 5.0


@struct.dataclass
class RunningMeanStdState:
    running_mean: jnp.ndarray
    running_var: jnp.ndarray
    count: jnp.ndarray  # scalar
    # static config
    clip: float = struct.field(pytree_node=False, default=DEFAULT_CLIP)
    eps: float = struct.field(pytree_node=False, default=NORM_EPS)
    norm_only: bool = struct.field(pytree_node=False, default=False)
    per_channel: bool = struct.field(pytree_node=False, default=False)


def rms_init(
    input_shape: Sequence[int],
    clip: float = DEFAULT_CLIP,
    eps: float = NORM_EPS,
    norm_only: bool = False,
    per_channel: bool = False,
) -> RunningMeanStdState:
    input_shape = tuple(input_shape)
    if per_channel:
        # channel-last layout (TPU-native HWC): stats per final channel dim
        shape: Tuple[int, ...] = (input_shape[-1],)
    else:
        shape = input_shape
    return RunningMeanStdState(
        running_mean=jnp.zeros(shape, jnp.float32),
        running_var=jnp.ones(shape, jnp.float32),
        count=jnp.ones((), jnp.float32),
        clip=clip,
        eps=eps,
        norm_only=norm_only,
        per_channel=per_channel,
    )


def _reduce_axes(state: RunningMeanStdState, x: jnp.ndarray) -> Tuple[int, ...]:
    if state.per_channel:
        return tuple(range(x.ndim - 1))  # all but channel
    # batch dims = leading dims not covered by the stats shape
    return tuple(range(x.ndim - state.running_mean.ndim))


def rms_update(
    state: RunningMeanStdState, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> RunningMeanStdState:
    """Merge batch moments into running moments (reference :50-62).

    `mask` (optional) weights samples along the LEADING batch dims of `x`
    (shape = a prefix of x.shape); masked-out samples contribute nothing.
    The reference updates its normalizers unmasked — safe there because each
    torch learner only ever sees its own policy's trajectories. In the TPU
    mixed-policy device self-play regime every policy's train_fn runs on the
    SHARED trajectory where (P-1)/P slots are structurally invalid (zero
    returns), so an unmasked update would dilute return statistics toward
    zero; callers pass valids as the mask. If the whole batch is masked out,
    the state is returned unchanged (no NaNs).
    """
    x = x.astype(jnp.float32)
    axes = _reduce_axes(state, x)
    if mask is None:
        batch_count = 1.0
        for a in axes:
            batch_count = batch_count * x.shape[a]
        batch_mean = jnp.mean(x, axis=axes)
        batch_var = jnp.var(x, axis=axes)
    else:
        w = mask.astype(jnp.float32)
        w_full = w.reshape(w.shape + (1,) * (x.ndim - w.ndim))  # broadcast over trailing dims
        # total weight per stats element: sum of w over mask dims x size of
        # the remaining (unmasked) reduction dims
        extra = 1.0
        for a in axes:
            if a >= w.ndim:
                extra = extra * x.shape[a]
        batch_count = jnp.sum(w) * extra
        safe_count = jnp.maximum(batch_count, 1.0)
        batch_mean = jnp.sum(w_full * x, axis=axes) / safe_count
        batch_var = jnp.sum(w_full * jnp.square(x - batch_mean), axis=axes) / safe_count

    delta = batch_mean - state.running_mean
    tot_count = state.count + batch_count
    safe_tot = jnp.maximum(tot_count, 1e-6)
    new_mean = state.running_mean + delta * batch_count / safe_tot
    m_a = state.running_var * state.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + jnp.square(delta) * state.count * batch_count / safe_tot
    new_var = m2 / safe_tot
    if mask is not None:
        # keep state bit-identical when the batch contributes no valid samples
        empty = batch_count == 0.0
        new_mean = jnp.where(empty, state.running_mean, new_mean)
        new_var = jnp.where(empty, state.running_var, new_var)
        tot_count = jnp.where(empty, state.count, tot_count)
    return state.replace(running_mean=new_mean, running_var=new_var, count=tot_count)


def _broadcast_stats(state: RunningMeanStdState, x: jnp.ndarray):
    mean, var = state.running_mean, state.running_var
    if state.per_channel:
        # stats shape [C] broadcasts against [..., C] naturally
        return mean, var
    return mean, var


def rms_normalize(state: RunningMeanStdState, x: jnp.ndarray) -> jnp.ndarray:
    mean, var = _broadcast_stats(state, x)
    sigma = jnp.sqrt(var + state.eps)
    if state.norm_only:
        return x / sigma
    return jnp.clip((x - mean) / sigma, -state.clip, state.clip)


def rms_denormalize(state: RunningMeanStdState, x: jnp.ndarray) -> jnp.ndarray:
    mean, var = _broadcast_stats(state, x)
    sigma = jnp.sqrt(var + state.eps)
    if state.norm_only:
        return x * sigma
    return jnp.clip(x, -state.clip, state.clip) * sigma + mean


def rms_summaries(state: RunningMeanStdState, prefix: str = "") -> Dict[str, jnp.ndarray]:
    return {
        f"{prefix}running_mean": jnp.mean(state.running_mean),
        f"{prefix}running_std": jnp.mean(jnp.sqrt(state.running_var + state.eps)),
    }


# ------------------------------------------------------------- dict variant

ObsRmsState = Dict[str, RunningMeanStdState]


def obs_rms_init(obs_space, keys_to_normalize: Optional[Sequence[str]] = None, **kwargs) -> ObsRmsState:
    """One RMS per observation key (reference RunningMeanStdDictInPlace)."""
    from sample_factory_tpu.envs.spaces import obs_space_as_dict

    spec = obs_space_as_dict(obs_space)
    out: ObsRmsState = {}
    for k, space in spec.items():
        if k == "action_mask":
            continue  # masks feed the action distribution, never normalized
        if keys_to_normalize is None or k in keys_to_normalize:
            out[k] = rms_init(space.shape, **kwargs)
    return out


def obs_rms_update(
    state: ObsRmsState, obs: Dict[str, jnp.ndarray], mask: Optional[jnp.ndarray] = None
) -> ObsRmsState:
    return {k: rms_update(v, obs[k], mask=mask) for k, v in state.items()}


def obs_rms_normalize(state: ObsRmsState, obs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: (rms_normalize(state[k], v) if k in state else v) for k, v in obs.items()}
