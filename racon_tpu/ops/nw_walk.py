"""Host traceback walk over the device kernel's packed move planes.

Python reference implementation; the production path uses the C++ walker
(native/src/align.cpp: rt_walk_moves_batch). Pads are skipped: an op is
recorded only when it consumes a real character."""

from __future__ import annotations

import numpy as np

from ..core.breakpoints import OP_MATCH, OP_INS, OP_DEL
from .nw_kernel import band_dlo


PACK = 16  # query rows per int32 move word (matches nw_kernel._PACK)


def walk_moves(moves: np.ndarray, m: int, n: int, m_cap: int, n_cap: int,
               w_band: int) -> np.ndarray:
    """moves: (M_CAP//16, W) int32 packed planes. Returns ops (k, 2) int32."""
    dlo = band_dlo(m_cap, n_cap, w_band)
    i, j = m_cap, n_cap
    rev: list[list[int]] = []

    def push(op):
        if rev and rev[-1][0] == op:
            rev[-1][1] += 1
        else:
            rev.append([op, 1])

    while i > 0 or j > 0:
        if i == 0:
            mv = 2  # row 0: all deletions
        elif j == 0:
            mv = 1  # column 0: all insertions
        else:
            k = j - i - dlo
            assert 0 <= k < w_band, f"path left the band at ({i},{j})"
            word = int(moves[(i - 1) // PACK, k])
            mv = (word >> (2 * ((i - 1) % PACK))) & 3
            assert mv != 3, f"invalid move on path at ({i},{j})"
        if mv == 0:
            if i <= m and j <= n:
                push(OP_MATCH)
            i -= 1
            j -= 1
        elif mv == 1:
            if i <= m:
                push(OP_INS)
            i -= 1
        else:
            if j <= n:
                push(OP_DEL)
            j -= 1
    rev.reverse()
    return np.asarray(rev, dtype=np.int32).reshape(-1, 2)
