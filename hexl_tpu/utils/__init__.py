"""Utility subsystems: validation (debug-only) and logging.

Note: `from hexl_tpu.utils import check` imports the *module*; the
functions are `check.check`, `check.check_bounds`, `check.debug_enabled`.
`check_bounds`/`debug_enabled`/`vlog`/`get_logger` are also re-exported
here for convenience.
"""

from . import check
from .check import check_bounds, debug_enabled
from .logging import get_logger, vlog

__all__ = ["check", "check_bounds", "debug_enabled", "get_logger", "vlog"]
