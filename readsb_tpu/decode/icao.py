"""Known-ICAO address filter.

The reference keeps two open-addressed hash tables swapped every 60 s for
TTL aging (icao_filter.c:96-154).  Here the host-side filter is two Python
sets with the same two-generation aging; the device-side representation is
an exact 2^24-bit bitmap (2 MB) — TPU-friendly: test = one gather + bit
test, merge = bitwise OR.
"""

from __future__ import annotations

import numpy as np

FILTER_TTL_MS = 60_000


class IcaoFilter:
    def __init__(self):
        self.cur: set[int] = set()
        self.prev: set[int] = set()
        self.next_swap_ms: int | None = None

    def add(self, addr: int) -> None:
        self.cur.add(addr & 0xFFFFFF)

    def test(self, addr: int) -> bool:
        addr &= 0xFFFFFF
        return addr in self.cur or addr in self.prev

    def expire(self, now_ms: int) -> None:
        """Swap generations every FILTER_TTL_MS (icao_filter.c:96-110)."""
        if self.next_swap_ms is None:
            self.next_swap_ms = now_ms + FILTER_TTL_MS
            return
        if now_ms >= self.next_swap_ms:
            self.prev = self.cur
            self.cur = set()
            self.next_swap_ms = now_ms + FILTER_TTL_MS

    # --- device bitmap (for the all-device scoring path) -------------------

    def bitmap(self) -> np.ndarray:
        """uint32[2^24 / 32] exact membership bitmap of both generations."""
        bm = np.zeros((1 << 24) // 32, dtype=np.uint32)
        for addr in self.cur | self.prev:
            bm[addr >> 5] |= np.uint32(1 << (addr & 31))
        return bm
