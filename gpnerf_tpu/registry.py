"""String-keyed builder registry — the framework's extension API.

The reference wires layers together by config-driven dynamic import:
`getattr(import_module(cfg.<layer>.file), 'build_*')(cfg)`
(/root/reference/tools/train.py:143,167,174-179; tools/_init_paths.py:24-37
puts every libs/* dir on sys.path so cfg strings resolve as module names).
This registry keeps the same config keys (`render.file`, `encoder.file`,
`head.file`, `train.file`, `train.criterion_file`, `dataset.*.file`) and the
same string values, resolved through an explicit table instead of sys.path
mutation. `register()` is the plugin hook for user extensions.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Dict[str, Callable]] = {}

# reference module-name aliases -> canonical registry names
_ALIASES = {
    ("head", "BaseNeRFHead"): "trainhead",
    ("render", "demo_render"): "DemoRender",
}


def register(kind: str, name: str, builder: Callable) -> Callable:
    _REGISTRY.setdefault(kind, {})[name] = builder
    return builder


def get(kind: str, name: str) -> Callable:
    name = _ALIASES.get((kind, name), name)
    _ensure_builtin_imports()
    try:
        return _REGISTRY[kind][name]
    except KeyError:
        known = sorted(_REGISTRY.get(kind, {}))
        raise KeyError(
            f"No builder registered for {kind!r}/{name!r}; known: {known}"
        ) from None


_imported = False


def _ensure_builtin_imports():
    """Import built-in modules lazily so registration side effects run."""
    global _imported
    if _imported:
        return
    _imported = True
    import gpnerf_tpu.data.synthetic_dataset  # noqa: F401
    import gpnerf_tpu.models.encoder  # noqa: F401
    import gpnerf_tpu.models.heads  # noqa: F401
    import gpnerf_tpu.render.base  # noqa: F401

    for mod in (
        "gpnerf_tpu.render.demo",
        "gpnerf_tpu.data.zjumocap",
        "gpnerf_tpu.data.thuman",
        "gpnerf_tpu.train.trainer",
        "gpnerf_tpu.train.criterion",
    ):
        try:
            __import__(mod)
        except ImportError:
            pass
