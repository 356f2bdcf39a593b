from .zarr_writer import ZarrTraceWriter
from .stores import AzureStore, GCSStore, HTTPStore, LocalStore, S3Store

__all__ = [
    "ZarrTraceWriter",
    "LocalStore",
    "S3Store",
    "GCSStore",
    "AzureStore",
    "HTTPStore",
]
