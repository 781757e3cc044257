"""Config package: `from gpnerf_tpu.config import cfg, update_config`.

Mirrors the reference's `from configs import cfg, update_config`
(/root/reference/configs/__init__.py:15).
"""

from gpnerf_tpu.config.default import cfg, update_config
from gpnerf_tpu.config.yacs_compat import CfgNode

__all__ = ["cfg", "update_config", "CfgNode"]
