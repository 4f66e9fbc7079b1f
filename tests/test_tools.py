"""Bench CLI + native-API surface tests (reference T1/T2 parity)."""

import json
import os

import pytest

from aocl_compression_tpu import native_api
from aocl_compression_tpu.tools import bench_cli


@pytest.fixture()
def sample(tmp_path, corpus):
    p = tmp_path / "sample.bin"
    p.write_bytes(corpus["text_64k"])
    return str(p)


def test_cli_single_method_verify(sample, capsys):
    rc = bench_cli.main(["-e", "lz4", "-t", "-p", "-i", "1", sample])
    assert rc == 0
    out = capsys.readouterr().out
    assert "lz4" in out and "OK" in out


def test_cli_all_codecs_json(sample, capsys):
    rc = bench_cli.main(["-a", "-t", "-i", "1", "--json", sample])
    assert rc == 0
    recs = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    methods = {r["method"] for r in recs}
    assert methods == {"lz4", "lz4hc", "lzma", "bzip2", "snappy", "zlib",
                       "zstd"}
    assert all(r.get("verify") == "OK" for r in recs)


def test_cli_numeric_method_and_level(sample, capsys):
    rc = bench_cli.main(["-e", "5:9", "-t", "-i", "1", "--json", sample])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert rec["method"] == "zlib" and rec["level"] == 9


def test_cli_native_mode(sample, capsys):
    rc = bench_cli.main(["-n", "-e", "snappy", "-t", "-i", "1", "--json",
                         sample])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert rec["verify"] == "OK"


def test_cli_optoff_and_dump(sample, tmp_path, capsys):
    dump = str(tmp_path / "dump.lz4")
    rc = bench_cli.main(["-e", "lz4", "-o", "-t", "-i", "1", "-d", dump,
                         sample])
    assert rc == 0
    assert os.path.getsize(dump) > 0


def test_native_api_roundtrips(corpus):
    data = corpus["text_64k"]
    n = len(data)
    assert native_api.LZ4_decompress_safe(
        native_api.LZ4_compress_default(data), n) == data
    assert native_api.LZ4_decompress_safe(
        native_api.LZ4_compress_HC(data, 9), n) == data
    assert native_api.snappy_uncompress(
        native_api.snappy_compress(data)) == data
    assert native_api.uncompress(native_api.compress2(data, 6), n) == data
    assert native_api.BZ2_bzBuffToBuffDecompress(
        native_api.BZ2_bzBuffToBuffCompress(data, 9), n) == data
    assert native_api.LzmaDecode(native_api.LzmaEncode(data, 6), n) == data
    assert native_api.ZSTD_decompress(
        native_api.ZSTD_compress(data, 3), n) == data


def test_native_api_interop_with_upstream_tools(corpus):
    """Native-API outputs decode with stock implementations and vice versa."""
    import zlib as _zlib
    import bz2 as _bz2
    data = corpus["text_64k"]
    assert _zlib.decompress(native_api.compress2(data, 6)) == data
    assert native_api.uncompress(_zlib.compress(data, 6), len(data)) == data
    assert _bz2.decompress(
        native_api.BZ2_bzBuffToBuffCompress(data, 9)) == data
    import zstandard
    assert zstandard.ZstdDecompressor().decompress(
        native_api.ZSTD_compress(data, 3),
        max_output_size=len(data)) == data


def test_native_api_bounds():
    assert native_api.LZ4_compressBound(1000) >= 1003
    assert native_api.snappy_max_compressed_length(1000) >= 1000
    assert native_api.compressBound(1000) >= 1013
    assert native_api.ZSTD_compressBound(1000) >= 1000
