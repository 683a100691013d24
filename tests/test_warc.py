"""WARC source (sources/warc.py): framing, binary safety, partitioning."""

from __future__ import annotations

import os

from public_transit_status_with_apache_kafka_spark.sources import warc


def test_format_parse_roundtrip_binary_payload(tmp_path):
    """Content-Length framing must survive payloads containing the
    record delimiter bytes themselves."""
    evil = b"WARC/1.0\r\n\r\nnot a record\r\n\r\n" + bytes(range(256))
    rec = warc.format_record(
        {"WARC-Type": "response", "WARC-Record-ID": "<urn:doc:1>"}, evil
    )
    rec2 = warc.format_record({"WARC-Type": "metadata"}, b"")
    out = list(warc.parse_records(rec + rec2))
    assert len(out) == 2
    assert out[0][1] == evil
    assert out[0][0]["WARC-Record-ID"] == "<urn:doc:1>"
    assert out[1][0]["WARC-Type"] == "metadata" and out[1][1] == b""


def test_reader_one_partition_per_file_and_truncation_error(spark, tmp_path):
    import pytest

    d = tmp_path / "shards"
    d.mkdir()
    for i in range(3):
        with open(d / f"part-{i}.warc", "wb") as fh:
            for j in range(4):
                fh.write(
                    warc.format_record(
                        {
                            "WARC-Type": "response",
                            "WARC-Record-ID": f"<urn:doc:{i * 10 + j}>",
                        },
                        f"payload {i}-{j}".encode(),
                    )
                )
    warc.register(spark)
    df = spark.read.format("warcsim").option("path", str(d)).load()
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 12
    assert {bytes(r.payload).decode()[:8] for r in rows} == {"payload "}

    # truncated tail must fail loudly, not silently drop the record
    with open(d / "part-0.warc", "ab") as fh:
        fh.write(b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort")
    with pytest.raises(Exception, match="truncated|PythonException"):
        spark.read.format("warcsim").option("path", str(d)).load().collect()


def test_distributed_writer_manifest(spark):
    from public_transit_status_with_apache_kafka_spark.io_util import load
    import shutil
    import tempfile

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    tmp = tempfile.mkdtemp(prefix="warcw_")
    try:
        manifest = warc.write_warc_shards(docs, tmp, n_shards=4)
        assert len(manifest) == 4
        n = sum(m["n_records"] for m in manifest)
        assert n == docs.count()
        disk = sum(
            os.path.getsize(os.path.join(tmp, f))
            for f in os.listdir(tmp)
            if f.endswith(".warc")
        )
        assert disk == sum(m["n_bytes"] for m in manifest)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
