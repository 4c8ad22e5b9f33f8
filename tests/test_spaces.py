"""Space machinery: Discretized mapping + static-spec arithmetic.

Mirrors reference tests/algo/test_spaces.py and adds the static-spec
conversions that are unique to this framework (spaces.py).
"""

import math

import gymnasium as gym
import pytest

from sample_factory_tpu.envs.discretized import Discretized
from sample_factory_tpu.envs.spaces import (
    Box,
    Discrete,
    TupleSpec,
    action_dtype,
    from_gym_space,
    num_action_parameters,
    num_actions,
)


@pytest.mark.parametrize("n,min_action,max_action", [(11, -10.0, 10.0), (3, 0.0, 1.0)])
def test_discretized(n, min_action, max_action):
    space = Discretized(n, min_action, max_action)
    assert 0 <= space.sample() < n
    step = (max_action - min_action) / (n - 1)
    expected = min_action
    for action in range(n):
        assert pytest.approx(space.to_continuous(action)) == expected
        expected += step


def test_discretized_is_discrete_to_the_framework():
    spec = from_gym_space(Discretized(11, -1.0, 1.0))
    assert spec == Discrete(11)
    assert num_actions(spec) == 1 and num_action_parameters(spec) == 11


def test_tuple_spec_arithmetic():
    spec = from_gym_space(
        gym.spaces.Tuple(
            [gym.spaces.Discrete(4), gym.spaces.Box(-1, 1, (3,)), gym.spaces.Discrete(12)]
        )
    )
    assert isinstance(spec, TupleSpec)
    # action vector: 1 (discrete) + 3 (box dims) + 1 (discrete)
    assert num_actions(spec) == 5
    # parameters: 4 logits + 3 means + 3 log-stds + 12 logits
    assert num_action_parameters(spec) == 22
    # mixed tuple stores actions as float (discrete components cast on use)
    assert action_dtype(spec) == "float32"
    assert action_dtype(TupleSpec((Discrete(2), Discrete(3)))) == "int32"


def test_box_bounds_preserved():
    spec = from_gym_space(gym.spaces.Box(-2.5, 2.5, (6,)))
    assert spec == Box((6,), -2.5, 2.5, "float32")
    assert num_action_parameters(spec) == 12


def test_unbounded_box():
    spec = Box((4,))
    assert math.isinf(spec.low) and math.isinf(spec.high)
