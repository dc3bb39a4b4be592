"""WebDataset tar-shard sink/source (sources/webdataset.py):
round-trip equality, deterministic shard bytes, manifest audit,
corruption detection, crash-debris cleanup, shard-size guard."""

from __future__ import annotations

import os
import tarfile

import pytest

from osm_render_spark.fixtures.images import pipeline_corpus_df
from osm_render_spark.sources.webdataset import (
    read_webdataset,
    verify_webdataset,
    write_webdataset,
)


def _corpus(spark, n=40):
    return pipeline_corpus_df(spark, n).select(
        "image_id", "bytes", "fmt", "caption"
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    path = str(tmp_path / "wds")
    corpus = _corpus(spark)
    stats = write_webdataset(corpus, path, n_shards=5)
    assert stats["n_samples"] == 40 and 1 <= stats["n_shards"] <= 5

    want = {
        r["image_id"]: (bytes(r["bytes"]), r["fmt"], r["caption"])
        for r in corpus.collect()
    }
    got = {
        r["image_id"]: (bytes(r["bytes"]), r["fmt"], r["caption"])
        for r in read_webdataset(spark, path).collect()
    }
    assert got == want

    audit = verify_webdataset(spark, path).collect()
    assert len(audit) == stats["n_shards"]
    assert all(r["ok"] for r in audit)
    m = spark.read.parquet(os.path.join(path, "_manifest"))
    assert m.agg({"n_samples": "sum"}).first()[0] == 40


def test_shard_bytes_deterministic(spark, tmp_path):
    corpus = _corpus(spark, 24)
    shas = []
    for d in ("a", "b"):
        path = str(tmp_path / d)
        write_webdataset(corpus, path, n_shards=3)
        audit = {r["shard"]: r["actual_sha"] for r in verify_webdataset(spark, path).collect()}
        shas.append(audit)
    assert shas[0] == shas[1]


def test_corruption_detected_and_samples_grouped(spark, tmp_path):
    path = str(tmp_path / "wds")
    write_webdataset(_corpus(spark, 20), path, n_shards=2)
    # every sample carries exactly an image member and a txt member
    tar0 = next(f for f in sorted(os.listdir(path)) if f.endswith(".tar"))
    with tarfile.open(os.path.join(path, tar0)) as tf:
        names = tf.getnames()
    stems = {os.path.splitext(n)[0] for n in names}
    assert len(names) == 2 * len(stems)
    # flip a byte: the audit must flag exactly that shard
    p = os.path.join(path, tar0)
    blob = bytearray(open(p, "rb").read())
    blob[1024] ^= 0xFF
    open(p, "wb").write(blob)
    audit = {r["shard"]: r["ok"] for r in verify_webdataset(spark, path).collect()}
    bad_shard = int(tar0.split("-")[1].split(".")[0])
    assert audit[bad_shard] is False
    assert all(ok for s, ok in audit.items() if s != bad_shard)


def test_crash_debris_removed_and_guard(spark, tmp_path):
    path = str(tmp_path / "wds")
    os.makedirs(path)
    debris = os.path.join(path, "shard-99999.tar.tmp")
    open(debris, "wb").write(b"partial")
    write_webdataset(_corpus(spark, 10), path, n_shards=2)
    assert not os.path.exists(debris)
    with pytest.raises(ValueError, match="max_shard_rows"):
        write_webdataset(_corpus(spark, 10), path, n_shards=1, max_shard_rows=5)
