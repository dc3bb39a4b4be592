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
    # the row guard now fires inside the build kernel (no pre-count
    # double scan), so it surfaces as a Spark job failure
    with pytest.raises(Exception, match="max_shard_rows"):
        write_webdataset(_corpus(spark, 10), path, n_shards=1, max_shard_rows=5)


def test_reexport_removes_stale_shards(spark, tmp_path):
    """Re-exporting into the same directory with fewer shards must not
    leave stale tars the reader would serve but the audit never checks
    (review catch)."""
    path = str(tmp_path / "wds")
    write_webdataset(_corpus(spark, 30), path, n_shards=6)
    n_before = len([f for f in os.listdir(path) if f.endswith(".tar")])
    assert n_before >= 3
    write_webdataset(_corpus(spark, 30), path, n_shards=2)
    tars = [f for f in os.listdir(path) if f.endswith(".tar")]
    assert len(tars) <= 2
    assert read_webdataset(spark, path).count() == 30  # no stale dupes


def test_null_caption_raises_clearly(spark, tmp_path):
    import pyspark.sql.functions as F

    corpus = _corpus(spark, 8).withColumn(
        "caption",
        F.when(F.col("image_id") == "img0000000003", F.lit(None)).otherwise(
            F.col("caption")
        ),
    )
    with pytest.raises(Exception, match="NULL caption.*img0000000003"):
        write_webdataset(corpus, str(tmp_path / "wds"), n_shards=1)
