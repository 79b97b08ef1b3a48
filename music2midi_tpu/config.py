"""Configuration system for music2midi-tpu.

A single YAML tree is the source of truth for every layer, mirroring the
reference's OmegaConf usage (reference: music2midi/model.py:23,
music2midi/transformer.py:13, music2midi/dataset.py:46) — but with zero
dependency on omegaconf: a small attribute-dict (`ConfigNode`) over pyyaml.

Reference config schema: /root/reference/config.yaml:1-51. A byte-compatible
default ships at the repo root (`config.yaml`) so reference configs load
unchanged.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Iterator, Mapping, Union

import yaml


class ConfigNode(Mapping):
    """Nested dot-access mapping. `cfg.model.t5.d_model` and `**cfg.model.t5`
    both work, like OmegaConf's DictConfig."""

    def __init__(self, data: Mapping[str, Any] | None = None):
        object.__setattr__(self, "_data", {})
        if data:
            for k, v in data.items():
                self._data[k] = _wrap(v)

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: object) -> bool:
        return key in self._data

    # -- attribute access --------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        # guard: during unpickling __getattr__ runs before __init__, so
        # self._data may not exist yet — avoid infinite recursion
        data = object.__getattribute__(self, "__dict__").get("_data")
        if data is None or key.startswith("__"):
            raise AttributeError(key)
        try:
            return data[key]
        except KeyError:
            raise AttributeError(key) from None

    # -- pickling -----------------------------------------------------------
    def __getstate__(self) -> dict:
        return {"data": self.to_dict()}

    def __setstate__(self, state: dict) -> None:
        object.__setattr__(self, "_data", {})
        for k, v in state["data"].items():
            self._data[k] = _wrap(v)

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = _wrap(value)

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = _wrap(value)

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    def to_dict(self) -> dict:
        """Recursively convert back to plain python containers."""
        return _unwrap(self)

    def copy(self) -> "ConfigNode":
        return ConfigNode(copy.deepcopy(self.to_dict()))

    def __repr__(self) -> str:
        return f"ConfigNode({self.to_dict()!r})"

    def __eq__(self, other: object) -> bool:
        if isinstance(other, ConfigNode):
            return self.to_dict() == other.to_dict()
        if isinstance(other, Mapping):
            return self.to_dict() == dict(other)
        return NotImplemented


def _wrap(value: Any) -> Any:
    if isinstance(value, ConfigNode):
        return value
    if isinstance(value, Mapping):
        return ConfigNode(value)
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def _unwrap(value: Any) -> Any:
    if isinstance(value, ConfigNode):
        return {k: _unwrap(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_unwrap(v) for v in value]
    return value


def load_config(path: Union[str, Path]) -> ConfigNode:
    """Load a YAML config file into a ConfigNode."""
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return ConfigNode(data or {})


def save_config(config: ConfigNode, path: Union[str, Path]) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(_unwrap(config), f, sort_keys=False)


def default_config_path() -> Path:
    """The config.yaml that ships at the repo root."""
    return Path(__file__).resolve().parent.parent / "config.yaml"


def default_config() -> ConfigNode:
    return load_config(default_config_path())


def resolve_config(config: Union[str, Path, ConfigNode, Mapping, None]) -> ConfigNode:
    """Accept a path, a mapping, an existing node, or None (-> defaults)."""
    if config is None:
        return default_config()
    if isinstance(config, ConfigNode):
        return config
    if isinstance(config, Mapping):
        return ConfigNode(config)
    return load_config(config)
