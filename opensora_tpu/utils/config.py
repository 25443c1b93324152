"""Python-file config system with ``_base_`` inheritance and CLI overrides.

Re-implements the reference's mmengine-based config semantics (reference:
opensora/utils/config.py:26-213) without mmengine:

- configs are plain Python files; every module-level non-dunder name becomes a
  config entry;
- a ``_base_`` entry (str or list of str, paths relative to the config file)
  is loaded first and deep-merged under the current file's entries;
- a ``_delete_: True`` key inside a dict replaces the base dict instead of
  merging into it;
- CLI overrides use dotted paths (``--a.b.c value``) with automatic type
  conversion driven by the existing value's type (bool/int/float/str/list/
  None);
- alias flags (``--resolution``, ``--num-frames``, ...) map into
  ``sampling_option`` fields (reference config.py:198-213);
- the ``AE_SPATIAL_COMPRESSION`` env var side-channel couples the AE spatial
  stride to noise shapes and bucket geometry (reference config.py:52-54).
"""

from __future__ import annotations

import ast
import importlib.util
import os
import sys
import types
from typing import Any, Dict, List


class Config(dict):
    """A dict with attribute access, nested-wrapping on the fly."""

    def __getattr__(self, key: str) -> Any:
        try:
            val = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        return val

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __delattr__(self, key: str) -> None:
        del self[key]

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict) and not isinstance(obj, Config):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, Config):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> dict:
        def _unwrap(o):
            if isinstance(o, dict):
                return {k: _unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [_unwrap(v) for v in o]
            return o

        return _unwrap(self)


def _exec_config_file(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    if not os.path.isfile(path):
        raise FileNotFoundError(f"config file not found: {path}")
    spec = importlib.util.spec_from_file_location(
        f"_osp_config_{abs(hash(path))}", path
    )
    mod = importlib.util.module_from_spec(spec)
    # allow config files to import siblings
    sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop(spec.name, None)
    def _keep(k: str, v: Any) -> bool:
        if k == "_base_":
            return True
        if k.startswith("__"):
            return False
        if isinstance(v, (types.ModuleType, types.FunctionType, type)):
            return False
        return True

    return {k: v for k, v in vars(mod).items() if _keep(k, v)}


def _merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Deep-merge ``override`` on top of ``base`` honoring ``_delete_``."""
    out = dict(base)
    for key, val in override.items():
        if (
            isinstance(val, dict)
            and isinstance(out.get(key), dict)
            and not val.get("_delete_", False)
        ):
            out[key] = _merge(out[key], val)
        else:
            if isinstance(val, dict):
                val = {k: v for k, v in val.items() if k != "_delete_"}
            out[key] = val
    return out


def load_config(path: str) -> Config:
    raw = _exec_config_file(path)
    bases = raw.pop("_base_", None)
    cfg: Dict[str, Any] = {}
    if bases is not None:
        if isinstance(bases, str):
            bases = [bases]
        for b in bases:
            bpath = os.path.join(os.path.dirname(os.path.abspath(path)), b)
            cfg = _merge(cfg, load_config(bpath).to_dict())
    cfg = _merge(cfg, raw)
    return Config.wrap(cfg)


def _convert_value(s: str, old: Any) -> Any:
    """Type-convert a CLI string against the existing value's type."""
    if isinstance(old, bool):
        if s.lower() in ("true", "1", "yes"):
            return True
        if s.lower() in ("false", "0", "no"):
            return False
        raise ValueError(f"cannot parse bool from {s!r}")
    if isinstance(old, int) and not isinstance(old, bool):
        try:
            return int(s)
        except ValueError:
            return float(s)
    if isinstance(old, float):
        return float(s)
    if isinstance(old, (list, tuple, dict)) or old is None:
        # literal eval for structured values; fall back to str
        try:
            return ast.literal_eval(s)
        except (ValueError, SyntaxError):
            if old is None:
                for caster in (int, float):
                    try:
                        return caster(s)
                    except ValueError:
                        pass
                if s.lower() in ("true", "false"):
                    return s.lower() == "true"
            return s
    return s


def _set_dotted(cfg: Config, dotted: str, raw_val: str) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = Config()
        node = node[k]
    old = node.get(keys[-1])
    node[keys[-1]] = _convert_value(raw_val, old)


# alias flags → sampling_option fields (reference utils/config.py:198-213)
_ALIASES = {
    "resolution": ("sampling_option", "resolution"),
    "aspect_ratio": ("sampling_option", "aspect_ratio"),
    "num_frames": ("sampling_option", "num_frames"),
    "num_steps": ("sampling_option", "num_steps"),
    "guidance": ("sampling_option", "guidance"),
    "guidance_img": ("sampling_option", "guidance_img"),
    "seed": ("sampling_option", "seed"),
    "flow_shift": ("sampling_option", "flow_shift"),
}


def parse_overrides(cfg: Config, argv: List[str]) -> Config:
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise ValueError(f"unexpected positional argument {arg!r}")
        key = arg[2:].replace("-", "_") if "." not in arg else arg[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(argv):
                raise ValueError(f"missing value for {arg}")
            val = argv[i + 1]
            i += 2
        if key in _ALIASES:
            sect, field = _ALIASES[key]
            if sect not in cfg:
                cfg[sect] = Config()
            old = cfg[sect].get(field)
            cfg[sect][field] = _convert_value(val, old)
        else:
            _set_dotted(cfg, key, val)
    return cfg


def apply_jax_platform_env() -> None:
    """Honor the JAX_PLATFORMS env var even under out-of-tree PJRT plugins.

    Some plugins (e.g. the tunneled TPU backend in this environment)
    register themselves programmatically and IGNORE ``JAX_PLATFORMS`` —
    a subprocess exported with ``JAX_PLATFORMS=cpu`` would still try to
    grab the TPU and, if the tunnel is down, hang for minutes in backend
    init. Re-asserting the env var through ``jax.config`` restores the
    documented behavior. No-op once a backend is already initialized."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already up, or jax absent — keep CLI startup robust


def parse_configs(argv: List[str] | None = None) -> Config:
    """Load a config file (first positional arg) and apply CLI overrides.

    Also re-asserts JAX_PLATFORMS (see apply_jax_platform_env) so every
    CLI built on this config system can be forced onto CPU for tests."""
    apply_jax_platform_env()
    if argv is None:
        argv = sys.argv[1:]
    if not argv:
        raise ValueError("usage: <script> CONFIG [--dotted.key value ...]")
    cfg_path, rest = argv[0], argv[1:]
    cfg = load_config(cfg_path)
    cfg = parse_overrides(cfg, rest)
    cfg["config_path"] = os.path.abspath(cfg_path)
    sync_ae_spatial_compression(cfg)
    return cfg


def sync_ae_spatial_compression(cfg: Config) -> None:
    """Propagate cfg.ae_spatial_compression to the env side-channel."""
    d = cfg.get("ae_spatial_compression")
    if d is not None:
        os.environ["AE_SPATIAL_COMPRESSION"] = str(int(d))


def ae_spatial_compression() -> int:
    return int(os.environ.get("AE_SPATIAL_COMPRESSION", 16))


def create_experiment_workspace(cfg: Config, output_root: str | None = None) -> str:
    """Create an experiment directory and dump the resolved config there."""
    import json
    import time

    root = output_root or cfg.get("outputs", "outputs")
    name = cfg.get("exp_name") or time.strftime("%Y%m%d-%H%M%S")
    exp_dir = os.path.join(root, name)
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f, indent=2, default=str)
    return exp_dir
