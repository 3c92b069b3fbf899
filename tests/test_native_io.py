"""Native tar fast path (native/tario.cpp) vs the pure-Python fallback.

The loader silently prefers NativeTarStream when libtario.so is built
(data/loader.py), so the two grouping implementations MUST agree on the
webdataset key semantics (base_plus_ext: split at the first dot of the
BASENAME; duplicate extension within a key starts a new sample).
"""

import io
import tarfile

import pytest

from cosmos_tpu.data.webdataset import tar_to_samples

native = pytest.importorskip("cosmos_tpu.data.native")
if native._load() is None:
    pytest.skip("libtario.so not built", allow_module_level=True)


def _write_tar(path, members):
    with tarfile.open(path, "w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def _collect_native(path):
    out = []
    for s in native.NativeTarStream([str(path)]):
        key = s.pop("__key__")
        out.append((key if isinstance(key, bytes) else key.encode(), dict(s)))
    return out


def _collect_python(path):
    out = []
    for s in tar_to_samples(str(path)):
        key = s.pop("__key__")
        out.append((key, dict(s)))
    return out


def test_native_matches_python_on_plain_tar(tmp_path):
    p = tmp_path / "plain.tar"
    _write_tar(p, [
        ("00001.jpg", b"img1"), ("00001.json", b"{}"),
        ("00002.jpg", b"img2"), ("00002.json", b"{2}"),
    ])
    assert _collect_native(p) == _collect_python(p)
    assert len(_collect_native(p)) == 2


def test_native_handles_dot_slash_prefix(tmp_path):
    """tar -cf shard.tar ./dir stores './'-prefixed names: the key split
    must use the basename's first dot, not the path's (which would give
    key '' and merge the whole shard into one sample)."""
    p = tmp_path / "dotslash.tar"
    _write_tar(p, [
        ("./00001.jpg", b"a"), ("./00001.json", b"{}"),
        ("./00002.jpg", b"b"), ("./00002.json", b"{}"),
    ])
    got = _collect_native(p)
    assert got == _collect_python(p)
    assert [k for k, _ in got] == [b"./00001", b"./00002"]
    assert all(set(v) == {"jpg", "json"} for _, v in got)


def test_native_handles_dotted_directory(tmp_path):
    p = tmp_path / "dotted.tar"
    _write_tar(p, [
        ("v1.2/0001.jpg", b"a"), ("v1.2/0001.json", b"{}"),
    ])
    got = _collect_native(p)
    assert got == _collect_python(p)
    assert got[0][0] == b"v1.2/0001"


def test_native_duplicate_key_yields_every_pair(tmp_path):
    """Concatenated tars repeat keys; a duplicate ext must START A NEW
    SAMPLE (Python nothrow-regroup semantics), not overwrite the first
    member and silently drop half the pairs."""
    p = tmp_path / "dup.tar"
    _write_tar(p, [
        ("k.jpg", b"first"), ("k.json", b"{1}"),
        ("k.jpg", b"second"), ("k.json", b"{2}"),
    ])
    got = _collect_native(p)
    assert got == _collect_python(p)
    assert len(got) == 2
    assert got[0][1]["jpg"] == b"first" and got[1][1]["jpg"] == b"second"
