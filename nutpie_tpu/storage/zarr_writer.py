"""Dependency-free streaming Zarr v2 writer for traces.

The reference streams draws into Zarr through the Rust ``zarrs`` crate with
a tokio writer pool (``wrapper.rs:1028-1038``, chunk size 16 draws).  This
module implements the equivalent natively: trace groups are laid out as a
Zarr v2 hierarchy with xarray ``_ARRAY_DIMENSIONS`` metadata, chunked
``(1 chain, chunk_draws, *shape)``, zlib-compressed, written incrementally
as each device chunk lands.  The result opens with
``xarray.open_datatree(path, engine="zarr")`` / ``zarr.open_group`` --
no zarr-python needed on the writing side.

Physical writes go through the native async writer (C++ thread pool,
``nutpie_tpu/storage/native.py``) when available, releasing the GIL while
compressing and writing; otherwise a Python thread pool.
"""

from __future__ import annotations

import json
import math
import threading
import zlib
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Optional

import numpy as np


def _dtype_str(dtype: np.dtype) -> str:
    dtype = np.dtype(dtype)
    if dtype == np.bool_:
        return "|b1"
    if dtype.kind == "O":
        raise TypeError("object dtype not supported in zarr storage")
    return dtype.str


def _fill_value(dtype: np.dtype):
    dtype = np.dtype(dtype)
    if dtype.kind == "f":
        return "NaN"
    if dtype.kind == "b":
        return False
    return 0


class ZarrTraceWriter:
    """Streams one sampling run into a Zarr v2 directory hierarchy."""

    def __init__(self, root: Path, *, compress_level: int = 1,
                 max_workers: int = 4):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._level = compress_level
        self._arrays: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._native = None
        try:
            from .native import NativeWriter

            self._native = NativeWriter(max_workers)
        except Exception:
            self._pool = ThreadPoolExecutor(max_workers=max_workers)
            self._futures: list = []
        self._write_json("", ".zgroup", {"zarr_format": 2})

    # ------------------------------------------------------------------ io

    def _write_json(self, group: str, name: str, data: dict) -> None:
        path = self.root / group / name if group else self.root / name
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(data, indent=1))

    def _submit(self, path: Path, raw: bytes) -> None:
        if self._native is not None:
            self._native.submit(str(path), raw, self._level)
        else:
            def work():
                path.write_bytes(zlib.compress(raw, self._level))

            self._futures.append(self._pool.submit(work))

    # -------------------------------------------------------------- layout

    def create_group(self, name: str, attrs: Optional[dict] = None) -> None:
        self._write_json(name, ".zgroup", {"zarr_format": 2})
        if attrs:
            self._write_json(name, ".zattrs", attrs)

    def create_array(
        self,
        group: str,
        name: str,
        *,
        n_chains: int,
        total_draws: int,
        item_shape: tuple[int, ...],
        dtype: np.dtype,
        dims: tuple[str, ...],
        chunk_draws: int,
        attrs: Optional[dict] = None,
    ) -> None:
        key = f"{group}/{name}"
        dtype = np.dtype(dtype)
        shape = [n_chains, total_draws, *item_shape]
        chunks = [1, chunk_draws, *item_shape]
        meta = {
            "zarr_format": 2,
            "shape": shape,
            "chunks": chunks,
            "dtype": _dtype_str(dtype),
            "compressor": {"id": "zlib", "level": self._level},
            "fill_value": _fill_value(dtype),
            "order": "C",
            "filters": None,
            "dimension_separator": ".",
        }
        self._write_json(key, ".zarray", meta)
        zattrs = {"_ARRAY_DIMENSIONS": list(dims)}
        if attrs:
            zattrs.update(attrs)
        self._write_json(key, ".zattrs", zattrs)
        with self._lock:
            self._arrays[key] = {
                "meta": meta, "dtype": dtype, "chunk_draws": chunk_draws,
                "written_draws": 0,
            }

    def create_coord(self, group: str, name: str, values: np.ndarray,
                     dim: Optional[str] = None) -> None:
        """A small 1-D coordinate array, written eagerly in one chunk."""
        values = np.asarray(values)
        if values.dtype.kind in ("U", "O"):
            values = values.astype("U")
            dtype_str = values.dtype.str
            fill = ""
        else:
            dtype_str = _dtype_str(values.dtype)
            fill = _fill_value(values.dtype)
        key = f"{group}/{name}"
        meta = {
            "zarr_format": 2,
            "shape": list(values.shape),
            "chunks": list(values.shape) or [1],
            "dtype": dtype_str,
            "compressor": {"id": "zlib", "level": self._level},
            "fill_value": fill,
            "order": "C",
            "filters": None,
            "dimension_separator": ".",
        }
        self._write_json(key, ".zarray", meta)
        self._write_json(
            key, ".zattrs", {"_ARRAY_DIMENSIONS": [dim or name]}
        )
        path = self.root / key / "0"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(zlib.compress(np.ascontiguousarray(values).tobytes(),
                                       self._level))

    # -------------------------------------------------------------- writes

    def append(self, group: str, name: str, values: np.ndarray) -> None:
        """Append ``values[chain, draws_in_chunk, ...]`` at the current draw
        offset.  Must be called with whole device chunks in order; the chunk
        size must equal ``chunk_draws`` except for the final partial chunk.
        """
        key = f"{group}/{name}"
        info = self._arrays[key]
        values = np.ascontiguousarray(values, info["dtype"])
        n_chains = values.shape[0]
        n_draws = values.shape[1]
        chunk_draws = info["chunk_draws"]
        start = info["written_draws"]
        chunk_idx = start // chunk_draws
        if start % chunk_draws != 0:
            raise ValueError("appends must be aligned to chunk_draws")
        if n_draws < chunk_draws:
            pad_shape = list(values.shape)
            pad_shape[1] = chunk_draws - n_draws
            fill = (
                np.nan if info["dtype"].kind == "f" else 0
            )
            values = np.concatenate(
                [values, np.full(pad_shape, fill, info["dtype"])], axis=1
            )
        n_item_dims = values.ndim - 2
        suffix = ".".join(["0"] * n_item_dims)
        for chain in range(n_chains):
            fname = f"{chain}.{chunk_idx}" + (f".{suffix}" if suffix else "")
            path = self.root / key / fname
            path.parent.mkdir(parents=True, exist_ok=True)
            self._submit(path, values[chain].tobytes())
        info["written_draws"] = start + n_draws

    def flush(self) -> None:
        if self._native is not None:
            self._native.flush()
        else:
            for fut in self._futures:
                fut.result()
            self._futures = []

    def finalize(self, actual_draws: Optional[int] = None) -> None:
        """Wait for writes, fix up shapes for aborted runs, consolidate."""
        self.flush()
        consolidated: dict[str, Any] = {}
        for key, info in self._arrays.items():
            if actual_draws is not None and actual_draws != info["meta"]["shape"][1]:
                info["meta"]["shape"][1] = actual_draws
                self._write_json(key, ".zarray", info["meta"])
        # consolidated metadata (.zmetadata) for fast open
        for path in sorted(self.root.rglob("*")):
            if path.name in (".zgroup", ".zarray", ".zattrs"):
                rel = str(path.relative_to(self.root))
                consolidated[rel.replace("\\", "/")] = json.loads(
                    path.read_text()
                )
        self._write_json(
            "", ".zmetadata",
            {"zarr_consolidated_format": 1, "metadata": consolidated},
        )

    def close(self) -> None:
        self.flush()
        if self._native is not None:
            self._native.close()
        elif hasattr(self, "_pool"):
            self._pool.shutdown(wait=True)


def read_zarr_array(root: Path, key: str) -> np.ndarray:
    """Minimal zarr v2 reader (for tests and the no-xarray fallback)."""
    root = Path(root)
    meta = json.loads((root / key / ".zarray").read_text())
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    fill = meta["fill_value"]
    if fill == "NaN":
        fill = np.nan
    out = np.full(shape, fill, dtype)
    grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
    for idx in np.ndindex(*grid):
        fname = ".".join(str(i) for i in idx)
        path = root / key / fname
        if not path.exists():
            continue
        raw = zlib.decompress(path.read_bytes())
        block = np.frombuffer(raw, dtype).reshape(chunks)
        slices = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        view = tuple(slice(0, sl.stop - sl.start) for sl in slices)
        out[slices] = block[view]
    return out
