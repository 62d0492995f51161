"""Seeding, logging, evaluator, path guards.

Contracts preserved from the reference (cited for parity checks):
* dataset family lists -> /root/reference/utils.py:13-16 (plus the new
  `synth*` family for offline/synthetic runs).
* evaluator: plain argmax accuracy for EVERY dataset. The reference
  defines an OGB-aware evaluator and then shadows it with a plain one
  (/root/reference/utils.py:130-156); the *behavior* — plain accuracy —
  is what we reproduce, intentionally.
* check_writable(overwrite=False) creates-if-missing and never clobbers
  (/root/reference/utils.py:44-51).
* logger: per-run file log, US/Pacific timestamps, optional console
  mirror (/root/reference/utils.py:59-85).
"""

from __future__ import annotations

import logging
import os
import random
import shutil
from datetime import datetime, timedelta, timezone

import numpy as np

CPF_data = ["cora", "citeseer", "pubmed", "a-computer", "a-photo"]
OGB_data = ["ogbn-arxiv", "ogbn-products"]
NonHom_data = ["pokec", "penn94"]
BGNN_data = ["house_class", "vk_class"]
SYNTH_prefix = "synth"


def set_seed(seed: int) -> None:
    """Seed host RNGs. Device-side randomness in this framework is
    explicit (jax.random keys derived from the run seed), so unlike the
    torch/cudnn knobs in the reference (utils.py:19-26) there is nothing
    global to pin on the accelerator."""
    np.random.seed(seed)
    random.seed(seed)


def get_evaluator(dataset: str):
    """argmax-accuracy evaluator for all datasets (see module docstring)."""

    def evaluator(out, labels) -> float:
        pred = np.asarray(out).argmax(axis=1)
        return float((pred == np.asarray(labels)).mean())

    return evaluator


def check_writable(path, overwrite: bool = True) -> None:
    path = str(path)
    if not os.path.exists(path):
        os.makedirs(path)
    elif overwrite:
        shutil.rmtree(path)
        os.makedirs(path)


def check_readable(path) -> None:
    if not os.path.exists(str(path)):
        raise ValueError(f"No such file or directory! {path}")


def _pacific_now() -> datetime:
    try:
        from zoneinfo import ZoneInfo

        return datetime.now(ZoneInfo("US/Pacific"))
    except Exception:  # pragma: no cover - fallback without tzdata
        return datetime.now(timezone(timedelta(hours=-8)))


def _timetz(*args):
    return _pacific_now().timetuple()


def get_logger(filename, console_log: bool = False, log_level: int = logging.INFO):
    logger = logging.getLogger("glnn_tpu.run")
    logger.propagate = False
    logger.setLevel(log_level)
    for hdlr in logger.handlers[:]:
        logger.removeHandler(hdlr)

    formatter = logging.Formatter("%(asctime)s: %(message)s", datefmt="%b%d %H-%M-%S")
    formatter.converter = _timetz

    file_handler = logging.FileHandler(str(filename))
    file_handler.setFormatter(formatter)
    logger.addHandler(file_handler)

    if console_log:
        console_handler = logging.StreamHandler()
        console_handler.setFormatter(formatter)
        logger.addHandler(console_handler)
    return logger
