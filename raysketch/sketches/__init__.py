"""Probabilistic structures: membership filters + mergeable sketches.

Filter families mirror the reference (/root/reference/src/root.zig:1-3):
split-block Bloom (sbbf), xor/binary-fuse (xorf), ribbon.  Extensions per
the north rule: HLL, count-min, KLL, t-digest (papers, see SURVEY.md §7.5).
"""

from .base import REGISTRY, Sketch, pack, unpack, sketch_from_bytes, register
from .sbbf import SbbfFilter, num_blocks_for
from .xorf import XorFilter, calculate_header
from .ribbon import RibbonFilter
from .hll import HllSketch
from .cms import CmsSketch
from .kll import KllSketch
from .tdigest import TDigest
from .bottomk import BottomKSketch

#: membership-filter registry, mirroring the FILTERS type list driven
#: generically by the reference tests (src/tests.zig:97-126)
FILTER_KINDS = {
    "sbbf": SbbfFilter,
    "xorf": XorFilter,
    "ribbon": RibbonFilter,
}

__all__ = [
    "REGISTRY", "Sketch", "pack", "unpack", "sketch_from_bytes", "register",
    "SbbfFilter", "num_blocks_for", "XorFilter", "calculate_header",
    "RibbonFilter", "HllSketch", "CmsSketch", "KllSketch", "TDigest",
    "BottomKSketch",
    "FILTER_KINDS",
]
