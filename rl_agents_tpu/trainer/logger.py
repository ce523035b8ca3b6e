"""Logging configuration (rebuild of reference rl_agents/trainer/logger.py:38-81):
INFO stream handler + per-run DEBUG file handler via dictConfig."""
from __future__ import annotations

import logging
import logging.config
from pathlib import Path

_FORMAT = "[%(levelname)s] %(message)s "
_DEBUG_FORMAT = "[%(name)s:%(levelname)s] %(message)s "


def configure(config: dict | None = None, default_level: str = "INFO"):
    if config:
        logging.config.dictConfig(config)
        return
    logging.config.dictConfig({
        "version": 1,
        "disable_existing_loggers": False,
        "formatters": {
            "standard": {"format": _FORMAT},
            "detailed": {"format": _DEBUG_FORMAT},
        },
        "handlers": {
            "default": {
                "level": default_level,
                "formatter": "standard",
                "class": "logging.StreamHandler",
            },
        },
        "loggers": {
            "": {"handlers": ["default"], "level": "DEBUG", "propagate": True},
            "matplotlib": {"level": "WARNING"},
            "PIL": {"level": "WARNING"},
            # jax attaches its own timestamped debug handler once the root
            # logger level drops to DEBUG; keep library internals quiet
            "jax": {"level": "WARNING"},
            "absl": {"level": "WARNING"},
        },
    })


def add_file_handler(path: Path):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    handler = logging.FileHandler(path)
    handler.setLevel(logging.DEBUG)
    handler.setFormatter(logging.Formatter(_DEBUG_FORMAT))
    logging.getLogger().addHandler(handler)
