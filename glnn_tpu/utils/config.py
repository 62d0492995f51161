"""Two-tier config: YAML hyperparameter table over CLI defaults.

Precedence contract (preserved from /root/reference/utils.py:29-41 and
the merge at /root/reference/train_teacher.py:225-229): the YAML table
value wins over the CLI flag for any key present in the YAML; CLI-only
keys survive. The table layout is `defaults:` (global) overlaid with
`<dataset>: <model_name>: {...}`; `model_name` is injected into the
returned dict. Overrides are logged by the CLIs so the silent-YAML-wins
behavior is at least visible.
"""

from __future__ import annotations

import yaml


def get_training_config(config_path: str, model_name: str, dataset: str) -> dict:
    with open(config_path, "r") as f:
        table = yaml.safe_load(f)
    conf = dict(table.get("defaults") or table.get("global") or {})
    if dataset not in table and dataset.startswith("synth"):
        dataset = "synth"
    dataset_table = table.get(dataset) or {}
    model_conf = dataset_table.get(model_name)
    if model_conf:
        conf.update(model_conf)
    conf["model_name"] = model_name
    return conf


def merge_args_with_config(args_dict: dict, conf: dict, logger=None) -> dict:
    """dict(args, **conf): YAML beats CLI. Logs every overridden key."""
    merged = dict(args_dict, **conf)
    if logger is not None:
        for k, v in conf.items():
            if k in args_dict and args_dict[k] != v:
                logger.info(f"config override: {k}: {args_dict[k]} -> {v}")
    return merged
