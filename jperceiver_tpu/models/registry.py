"""Name -> model-class registry (parity with `mono/model/registry.py:8-41`)."""

from __future__ import annotations

MODELS: dict[str, type] = {}


def register(cls=None, *, name: str | None = None):
    def wrap(c):
        key = name or c.__name__
        if key in MODELS:
            raise KeyError(f"{key} already registered")
        MODELS[key] = c
        return c

    return wrap(cls) if cls is not None else wrap


def build_model(cfg):
    """Instantiate a registered model from a config namespace.

    Mirrors `train.py:81`: the config's `model.name` selects the class; the
    whole model config is handed to the constructor.
    """
    name = cfg.name if hasattr(cfg, "name") else cfg["name"]
    if name not in MODELS:
        raise KeyError(f"unknown model '{name}'; have {sorted(MODELS)}")
    return MODELS[name].from_config(cfg)
