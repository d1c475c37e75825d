"""Large-array abstraction (SURVEY.md §2 #3).

The Java reference needed ``LSeq``/``LIntArray`` wrappers because Java arrays
are capped at 2^31 elements.  NumPy has no such cap, so the host side is a
thin facade; what survives of the concern on TPU is *index width*: device
arrays use int32, so any single index shard must stay below 2^31 elements.
Human chr1 (~230 Mbp) fits; a whole-genome (~3.1 Gbp) index must be built as
multiple sub-indexes (per chromosome group / per interval shard) — see
``parallel.sharded_index``.
"""

from __future__ import annotations

import numpy as np

INT32_MAX = np.iinfo(np.int32).max


def index_dtype(n: int):
    """Smallest sufficient integer dtype for indices into an array of size n."""
    return np.int32 if n <= INT32_MAX else np.int64


def check_device_indexable(n: int, what: str = "array") -> None:
    if n > INT32_MAX:
        raise ValueError(
            f"{what} has {n} elements > 2^31-1; split into sub-indexes "
            "(see parallel.sharded_index) before uploading to device"
        )
