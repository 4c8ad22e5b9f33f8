"""Generate docs/configuration.md from the live argparse registry.

The flag surface is the API contract shared with the reference
(SURVEY.md §7.1); generating the page from the parser keeps it drift-free.

    python tools/gen_config_docs.py > docs/configuration.md
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from sample_factory_tpu.cfg import cfg as cfg_mod

    groups = [
        ("Basic CLI", cfg_mod.add_basic_cli_args),
        ("RL / PPO", cfg_mod.add_rl_args),
        ("Model", cfg_mod.add_model_args),
        ("Environment", cfg_mod.add_default_env_args),
        ("Evaluation", cfg_mod.add_eval_args),
        ("Weights & Biases", cfg_mod.add_wandb_args),
        ("Population-Based Training", cfg_mod.add_pbt_args),
        ("TPU-native (new vs the reference)", cfg_mod.add_tpu_args),
    ]

    print("# Configuration reference")
    print()
    print("Generated from the argparse registry (`tools/gen_config_docs.py`).")
    print("The flag surface matches the reference framework's; the final group")
    print("is TPU-native additions. Two-phase parsing lets integrations override")
    print("defaults (`parse_sf_args` -> env-specific `set_defaults` -> `parse_full_cfg`).")
    print()
    for title, add_fn in groups:
        p = argparse.ArgumentParser(add_help=False)
        try:
            add_fn(p)
        except Exception as e:  # noqa: BLE001
            print(f"<!-- failed to render group {title}: {e} -->")
            continue
        print(f"## {title}")
        print()
        print("| flag | default | help |")
        print("|---|---|---|")
        for a in p._actions:
            if not a.option_strings:
                continue
            flag = a.option_strings[-1]
            if flag in ("-h", "--help"):
                continue
            default = a.default
            if isinstance(default, str):
                default = f'"{default}"'
            h = (a.help or "").replace("|", "\\|").replace("\n", " ")
            print(f"| `{flag}` | `{default}` | {h} |")
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
