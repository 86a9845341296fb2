"""Multi-chip parallelism: sharded NTT and RNS pipelines over a device mesh."""

from .dist_ntt import DistNTT, make_mesh

__all__ = ["DistNTT", "make_mesh"]
