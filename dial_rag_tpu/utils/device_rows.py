"""Zero-copy row views over a device-resident query-wave output.

A coalesced query wave encodes Q texts in ONE dispatch and leaves a
``[Qb, D]`` jax array in HBM (``Qb`` = the power-of-two encode bucket,
rows ``0..Q-1`` real). Handing each waiter its row via ``out[i]``
costs one eager slice dispatch per row — and through a remote device
link each DISTINCT ``(Qb, i)`` slice is a fresh XLA compile (~1 s
observed) plus a per-dispatch round-trip, which re-serializes exactly
the latency the wave was built to amortize (measured in the service
bench's concurrent profile: the slice compiles dominated the QPS
ceiling).

``DeviceRow`` instead carries ``(parent, index)`` without touching the
device. Wave-level consumers (``DenseIndex._scan_wave``) recognize
same-parent rows and feed the parent array straight back into the
batched scan kernel, so the encode->scan path makes ZERO row-level
dispatches; row-level consumers call :meth:`resolve` (one slice, memoized)
or coerce via ``np.asarray`` exactly as they would a jax array.
"""

from __future__ import annotations

import numpy as np


class DeviceRow:
    """One row of a device-resident ``[Qb, D]`` array, unmaterialized."""

    __slots__ = ("parent", "index", "_resolved")

    def __init__(self, parent, index: int):
        self.parent = parent
        self.index = int(index)
        self._resolved = None

    @property
    def shape(self) -> tuple:
        return tuple(self.parent.shape[1:])

    @property
    def dtype(self):
        return self.parent.dtype

    def resolve(self):
        """Materialize the row as a device array (one slice dispatch,
        memoized — only paid on paths that cannot consume the wave)."""
        if self._resolved is None:
            self._resolved = self.parent[self.index]
        return self._resolved

    def __array__(self, dtype=None, copy=None):
        arr = np.asarray(self.resolve())
        if dtype is not None:
            arr = arr.astype(dtype, copy=False)
        return arr

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return (
            f"DeviceRow(index={self.index}, "
            f"parent={self.parent.shape}@{self.parent.dtype})"
        )


def as_wave(rows: list) -> tuple | None:
    """If every row is a ``DeviceRow`` of ONE shared parent, return
    ``(parent, indices)``; else ``None`` (caller falls back to
    per-row materialization)."""
    if not rows or not all(isinstance(r, DeviceRow) for r in rows):
        return None
    parent = rows[0].parent
    if any(r.parent is not parent for r in rows[1:]):
        return None
    return parent, [r.index for r in rows]
