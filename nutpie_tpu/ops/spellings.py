"""Trace-time switch between XLA-idiomatic and Mosaic-legal op spellings.

The NUTS machine step (``sampler/nuts.py``) is traced in two contexts with
different lowering constraints:

- **XLA** (the default runner, ``run.make_chunk_runner``): static ``.at[]``
  row writes, vector ``dot``s, boolean reshapes/reductions and boolean-data
  selects all lower well and fuse; this is the 99% path and must stay
  maximally XLA-idiomatic (round-3 lesson: Mosaic-safe rewrites applied
  unconditionally cost the default path 2.4x in measured grads/s,
  BENCH_r01 vs BENCH_r03).
- **Mosaic** (the Pallas megakernel, ``sampler/megakernel.py``): static
  ``.at[]`` writes lower as ``scatter`` (unliftable), vmapped ``dot_general``
  over the chain tile produces dimension numbers Mosaic cannot parse, i1
  vectors cannot be reshaped or reduced, and boolean-data selects lower
  through i8 truncations Mosaic rejects.

One state machine, two op *spellings*, selected at trace time: the kernel
body enters :func:`mosaic_spellings` (alongside
``row_write.force_mode("select")``) and every dual-spelled helper branches on
:func:`mosaic`.  Both spellings compute identical values; only the emitted
HLO differs.
"""

from __future__ import annotations

_MOSAIC: list[bool] = []


class mosaic_spellings:
    """Context manager: trace with Mosaic-legal op spellings."""

    def __enter__(self):
        _MOSAIC.append(True)
        return self

    def __exit__(self, *exc):
        _MOSAIC.pop()
        return False


def mosaic() -> bool:
    """True while tracing code destined for a Pallas/Mosaic kernel body."""
    return bool(_MOSAIC)
