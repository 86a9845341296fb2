"""Debug-only input validation — the HEXL_CHECK / HEXL_CHECK_BOUNDS analogue.

Like the reference (hexl/include/hexl/util/check.hpp:19-43, and
README.md:244-248: release builds perform zero validation by design),
checks are no-ops unless debug mode is on. Enable with HEXL_TPU_DEBUG=1.
Checks run host-side on host inputs; device-resident U64 pytrees are
validated only for structure (forcing a device sync to range-check traced
values would break pipelining).
"""

from __future__ import annotations

import numpy as np

from .. import config
from ..limb import U64, from_limbs


def debug_enabled() -> bool:
    return config.debug_checks()


def check(cond: bool, message: str) -> None:
    """Raise ValueError(message) when debug mode is on and cond is false."""
    if debug_enabled() and not cond:
        raise ValueError(message)


def check_bounds(values, bound: int, message: str) -> None:
    """Check all elements are < bound (debug mode only).

    Host arrays are checked exactly; device U64 pytrees are pulled to host
    (debug mode trades speed for safety, like the reference's Debug build).
    """
    if not debug_enabled():
        return
    if isinstance(values, U64):
        arr = from_limbs(values)
    else:
        arr = np.asarray(values, dtype=np.uint64)
    if arr.size and int(arr.max()) >= bound:
        raise ValueError(f"{message}: max value {int(arr.max())} "
                         f">= bound {bound}")
