"""Zarr store targets, mirroring ``nutpie.zarr_store`` (reference
``sample.py:472-478`` exposing pyo3-object_store's Local/S3/GCS/Azure/HTTP
stores).

``LocalStore`` is implemented natively (see ``zarr_writer``); the object
store backends require the optional ``obstore`` package for network IO and
raise a clear error when it is missing (this image has no network egress).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path


@dataclasses.dataclass(frozen=True)
class LocalStore:
    """Local filesystem zarr store."""

    path: str

    def writer_root(self) -> Path:
        root = Path(self.path)
        root.mkdir(parents=True, exist_ok=True)
        return root


class _ObstoreBacked:
    _name = ""

    def __init__(self, *args, **kwargs):
        try:
            import obstore  # noqa: F401
        except ImportError as err:
            raise ImportError(
                f"{self._name} requires the optional 'obstore' package for "
                f"object-store IO"
            ) from err
        self._args = args
        self._kwargs = kwargs


class S3Store(_ObstoreBacked):
    _name = "S3Store"


class GCSStore(_ObstoreBacked):
    _name = "GCSStore"


class AzureStore(_ObstoreBacked):
    _name = "AzureStore"


class HTTPStore(_ObstoreBacked):
    _name = "HTTPStore"
