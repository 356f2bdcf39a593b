"""Streaming Zarr storage tests (reference: tests/test_pymc.py:555-605)."""

import json
import zlib
from pathlib import Path

import numpy as np
import pytest

import nutpie_tpu
from nutpie_tpu.frontends.pyfunc import compile_model_def
from nutpie_tpu.models import eight_schools, std_normal
from nutpie_tpu.storage.zarr_writer import read_zarr_array
from nutpie_tpu.zarr_store import LocalStore


def test_native_writer_roundtrip(tmp_path):
    pytest.importorskip("ctypes")
    from nutpie_tpu.storage.native import NativeWriter

    w = NativeWriter(2)
    data = np.arange(1000, dtype=np.float64).tobytes()
    path = tmp_path / "chunk.bin"
    w.submit(str(path), data, 1)
    w.flush()
    assert w.errors == 0
    out = zlib.decompress(path.read_bytes())
    assert out == data
    w.close()


def test_zarr_streaming_roundtrip(tmp_path):
    model = compile_model_def(eight_schools())
    store = LocalStore(str(tmp_path / "trace.zarr"))
    trace = nutpie_tpu.sample(
        model, chains=2, draws=120, tune=80, seed=7, progress_bar=False,
        zarr_store=store, chunk_size=25,
    )
    root = Path(store.path)
    assert (root / ".zmetadata").exists()
    meta = json.loads((root / ".zmetadata").read_text())
    assert "posterior/mu/.zarray" in meta["metadata"]

    # the returned trace is store-backed (lazy); an independent in-memory
    # run with the same seed must produce identical draws on disk
    from nutpie_tpu.trace import LazyDataArray

    assert isinstance(trace.posterior["mu"], LazyDataArray)
    mem_trace = nutpie_tpu.sample(
        model, chains=2, draws=120, tune=80, seed=7, progress_bar=False,
        chunk_size=25,
    )
    disk_mu = read_zarr_array(root, "posterior/mu")
    np.testing.assert_allclose(
        disk_mu, np.asarray(mem_trace.posterior["mu"].values)
    )
    np.testing.assert_allclose(
        np.asarray(trace.posterior["mu"].values), disk_mu
    )
    disk_theta = read_zarr_array(root, "posterior/theta")
    assert disk_theta.shape == (2, 120, 8)
    np.testing.assert_allclose(
        disk_theta, np.asarray(mem_trace.posterior["theta"].values)
    )
    np.testing.assert_allclose(
        np.asarray(trace.posterior["theta"].values), disk_theta
    )
    warm = read_zarr_array(root, "warmup_posterior/mu")
    assert warm.shape == (2, 80)
    stats = read_zarr_array(root, "sample_stats/diverging")
    assert stats.dtype == np.bool_
    # xarray metadata present
    zattrs = json.loads((root / "posterior/theta/.zattrs").read_text())
    assert zattrs["_ARRAY_DIMENSIONS"] == ["chain", "draw", "school"]
    sattrs = json.loads((root / "sample_stats/.zattrs").read_text())
    assert sattrs["inference_library"] == "nutpie_tpu"


def test_zarr_openable_by_zarr_python(tmp_path):
    zarr = pytest.importorskip("zarr")
    model = compile_model_def(std_normal(2))
    store = LocalStore(str(tmp_path / "t.zarr"))
    nutpie_tpu.sample(
        model, chains=2, draws=40, tune=40, seed=1, progress_bar=False,
        zarr_store=store,
    )
    g = zarr.open_group(store.path, mode="r")
    assert g["posterior/x"].shape == (2, 40, 2)


def test_memory_store_roundtrip():
    # MemoryStore exercises the transport abstraction the object-store
    # backends use (reference streams through object_store; wrapper.rs:1028)
    from nutpie_tpu.storage.stores import MemoryStore

    model = compile_model_def(std_normal(2))
    store = MemoryStore()
    trace = nutpie_tpu.sample(
        model, chains=2, draws=60, tune=40, seed=3, progress_bar=False,
        zarr_store=store, chunk_size=20,
    )
    assert any(k.endswith(".zmetadata") or k == ".zmetadata"
               for k in store.mapping)
    mem_x = read_zarr_array(store, "posterior/x")
    np.testing.assert_allclose(
        mem_x, np.asarray(trace.posterior["x"].values)
    )


def test_object_store_classes_require_obstore():
    from nutpie_tpu.storage.stores import AzureStore, GCSStore, HTTPStore, S3Store

    for cls in (S3Store, GCSStore, AzureStore, HTTPStore):
        try:
            import obstore  # noqa: F401

            pytest.skip("obstore installed; constructor path exercised")
        except ImportError:
            with pytest.raises(ImportError, match="obstore"):
                cls("bucket")


def test_resume_into_zarr(tmp_path):
    # checkpoint/resume composes with streaming zarr: the resumed run
    # appends at the durable offset and the final store equals a full run
    model = compile_model_def(std_normal(3))
    store_full = LocalStore(str(tmp_path / "full.zarr"))
    common = dict(chains=2, draws=120, tune=80, seed=11, progress_bar=False,
                  chunk_size=25)
    nutpie_tpu.sample(model, zarr_store=store_full, **common)

    ckpt = tmp_path / "state.npz"
    store = LocalStore(str(tmp_path / "resumed.zarr"))
    nutpie_tpu.sample(
        model, chains=2, draws=20, tune=80, seed=11, progress_bar=False,
        chunk_size=25, checkpoint=str(ckpt), zarr_store=store,
    )
    nutpie_tpu.sample(
        model, resume_from=str(ckpt), zarr_store=store, **common
    )
    x_full = read_zarr_array(Path(store_full.path), "posterior/x")
    x_res = read_zarr_array(Path(store.path), "posterior/x")
    assert x_res.shape == x_full.shape
    # BIT-exact: the resumed run recomputes the same deterministic draws,
    # so moving the chunk boundary (resume mid-chunk) must not perturb a
    # single stored byte of the decoded arrays
    np.testing.assert_array_equal(x_res, x_full)
    w_full = read_zarr_array(Path(store_full.path), "warmup_posterior/x")
    w_res = read_zarr_array(Path(store.path), "warmup_posterior/x")
    np.testing.assert_array_equal(w_res, w_full)


def test_zarr_spec_conformance_and_string_payloads(tmp_path):
    """Validate the written store with an INDEPENDENT zarr v2 decoder
    (tests/zarr_spec.py, written from the spec, shares no code with the
    writer), including string coords and the divergence_message column
    (reference round-trip semantics: tests/test_pymc.py:555-605)."""
    from nutpie_tpu import from_pyfunc
    from zarr_spec import validate_store

    import jax.numpy as jnp

    school_names = np.array(
        ["choate", "deerfield", "phillips", "hotchkiss"], dtype=object
    )

    def make_logp(**shared):
        def logp(x):
            return -0.5 * jnp.sum(x**2)
        return logp

    def make_expand(**shared):
        def expand(x):
            return {"theta": x}
        return expand

    model = from_pyfunc(
        ndim=4,
        make_logp_fn=make_logp,
        make_expand_fn=make_expand,
        expanded_dtypes=[np.float64],
        expanded_shapes=[(4,)],
        expanded_names=["theta"],
        dims={"theta": ("school",)},
        coords={"school": school_names},
    )
    store = LocalStore(str(tmp_path / "s.zarr"))
    nutpie_tpu.sample(
        model, chains=2, draws=60, tune=40, seed=5, progress_bar=False,
        zarr_store=store, chunk_size=20, store_divergences=True,
    )
    arrays = validate_store(store.path)
    # string coord persisted and decodable by the independent reader
    assert "posterior/school" in arrays
    assert list(arrays["posterior/school"]) == list(school_names)
    # divergence_message column persisted as fixed-width unicode
    assert "sample_stats/divergence_message" in arrays
    msgs = arrays["sample_stats/divergence_message"]
    assert msgs.dtype.kind == "U"
    assert msgs.shape[:2] == (2, 60)

    # store-backed trace exposes the string coord too
    from nutpie_tpu.trace import open_zarr_trace

    tr = open_zarr_trace(store)
    assert list(tr.posterior["theta"].coords["school"]) == list(school_names)


def test_zarr_store_backed_abort_partial(tmp_path):
    # an aborted zarr run still returns a (store-backed) partial trace with
    # the shapes shrunk to the draws actually produced
    model = compile_model_def(std_normal(2))
    store = LocalStore(str(tmp_path / "p.zarr"))
    sampler = nutpie_tpu.sample(
        model, chains=2, draws=100_000, tune=50, seed=9, progress_bar=False,
        zarr_store=store, chunk_size=10, blocking=False,
    )
    import time as _time

    while sampler._draws_done < 60:
        _time.sleep(0.01)
    trace = sampler.abort()
    assert trace is not None
    x = np.asarray(trace.posterior["x"].values)
    assert 0 < x.shape[1] < 100_000
    assert np.isfinite(x).all()


def test_zarr_spec_checker_edge_cases():
    """The independent spec checker covers the v2 metadata surface the
    image-local substitute for ``xr.open_datatree`` parity needs
    (reference ``sample.py:615-627``): F-order chunks decode with Fortran
    semantics, unsupported ``filters`` are rejected, missing required keys
    are rejected, and 0-d arrays decode."""
    import json as _json
    import zlib as _zlib

    from zarr_spec import SpecError, decode_array, validate_array_meta

    import pytest as _pytest

    def meta(**over):
        doc = {
            "zarr_format": 2, "shape": [2, 3], "chunks": [2, 3],
            "dtype": "<f8", "compressor": {"id": "zlib", "level": 1},
            "fill_value": 0.0, "order": "C", "filters": None,
        }
        doc.update(over)
        return doc

    # F-order chunk bytes decode transposed relative to C
    data = np.arange(6, dtype="<f8").reshape(2, 3)
    store = {
        "a/.zarray": _json.dumps(meta(order="F")).encode(),
        "a/0.0": _zlib.compress(data.tobytes(order="F")),
    }
    np.testing.assert_array_equal(decode_array(store, "a"), data)
    # the same bytes under order C decode DIFFERENTLY (sanity of the check)
    store_c = {
        "a/.zarray": _json.dumps(meta(order="C")).encode(),
        "a/0.0": _zlib.compress(data.tobytes(order="F")),
    }
    assert not np.array_equal(decode_array(store_c, "a"), data)

    # non-empty filters rejected (the checker implements no codecs)
    with _pytest.raises(SpecError, match="filters"):
        validate_array_meta(meta(filters=[{"id": "vlen-utf8"}]), "a")
    # missing required key rejected
    bad = meta()
    del bad["fill_value"]
    with _pytest.raises(SpecError, match="missing required"):
        validate_array_meta(bad, "a")
    # wrong zarr_format rejected
    with _pytest.raises(SpecError, match="zarr_format"):
        validate_array_meta(meta(zarr_format=3), "a")

    # 0-d array decodes (empty shape/chunks lists, one chunk key "0"... the
    # v2 spec stores the single chunk of a 0-d array under key "0")
    zero = {
        "z/.zarray": _json.dumps(meta(shape=[], chunks=[])).encode(),
    }
    # chunks must match shape rank; for 0-d the chunk list is empty and the
    # fill value is returned when no chunk is present
    out = decode_array(zero, "z")
    assert out.shape == () and out == 0.0


def test_divergence_message_truncation_boundary(tmp_path):
    """String stats round-trip through the sink at the 128-char fixed
    width (storage/sink.py:_STRING_WIDTH): 127/128-char messages survive
    exactly, 129-char messages truncate to 128."""
    from zarr_spec import validate_store

    from nutpie_tpu.storage import LocalStore
    from nutpie_tpu.storage.sink import _STRING_WIDTH, ZarrTraceSink

    assert _STRING_WIDTH == 128
    msgs = np.array(
        [["a" * 127, "b" * 128, "c" * 129, ""]], dtype=object
    )  # [1 chain, 4 draws]
    chunk = {
        "expanded": {"x": np.zeros((1, 4, 2))},
        "stats": {"divergence_message": msgs},
    }
    store = LocalStore(str(tmp_path / "m.zarr"))
    sink = ZarrTraceSink(store, n_chains=1, num_tune=0, num_draws=4,
                         save_warmup=False, chunk_draws=3)
    sink.append_chunk(chunk, 0, {}, {})
    sink.finalize(4)
    arrays = validate_store(store.path)
    got = arrays["sample_stats/divergence_message"]
    assert got.dtype == np.dtype("<U128")
    assert got[0, 0] == "a" * 127
    assert got[0, 1] == "b" * 128
    assert got[0, 2] == "c" * 128  # truncated at the fixed width
    assert got[0, 3] == ""
