"""File + console logging (counterpart of reference utils/utils.py:40-51)."""

from __future__ import annotations

import logging
import os
import time

__all__ = ["log_init"]


def log_init(log_dir: str, name: str = "log", level: int = logging.INFO) -> None:
    os.makedirs(log_dir, exist_ok=True)
    stamp = time.strftime("%Y-%m-%d_%H:%M:%S", time.localtime())
    logging.basicConfig(
        filename=os.path.join(log_dir, f"{name}_{stamp}.log"),
        format="%(asctime)s - %(pathname)s[line:%(lineno)d] - %(levelname)s: %(message)s",
        level=level,  # INFO by default: DEBUG floods the file with jax internals
        force=True,
    )
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(logging.Formatter("%(levelname)-8s %(message)s"))
    logging.getLogger("").addHandler(console)
