"""Zarr store constructors, mirroring ``nutpie.zarr_store``.

The reference exposes pyo3-object_store's store types here
(``python/nutpie/__init__.py`` re-exports; used via
``sample(..., zarr_store=nutpie.zarr_store.LocalStore(path))``).
``LocalStore`` streams through the native writer; the object-store
backends need the optional ``obstore`` package.
"""

from .storage.stores import AzureStore, GCSStore, HTTPStore, LocalStore, S3Store

__all__ = ["LocalStore", "S3Store", "GCSStore", "AzureStore", "HTTPStore"]
