"""End-to-end scene pipeline with checkpoints: scene → join → render →
sprites → atlas, rerun = full cache hit."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from osm_render_spark.fixtures.osm import ALL_SCENES
from osm_render_spark.pipeline import render_scene_pipeline
from osm_render_spark.plans.checkpoint import CheckpointStore


@pytest.fixture()
def store():
    d = tempfile.mkdtemp(prefix="pipe_")
    yield CheckpointStore(d)
    shutil.rmtree(d, ignore_errors=True)


def _areas(spark):
    return spark.createDataFrame(
        [
            (0, 0, [(8.05, 50.05), (8.10, 50.05), (8.10, 50.10), (8.05, 50.10)]),
            (0, 1, [(8.12, 50.12), (8.18, 50.12), (8.15, 50.18)]),
        ],
        "scene_id long, area_id long, polygon array<struct<lon:double,lat:double>>",
    )


def test_pipeline_end_to_end_and_resume(spark, store):
    from osm_render_spark.raster.codec import decode_png

    scene = ALL_SCENES["bridges"]()
    out = render_scene_pipeline(spark, scene, _areas(spark), store)

    assert out["ways"].count() == 3  # ways 20, 21, 22 (23 is the decoy)
    tiles = out["tiles"].collect()
    assert len(tiles) == 1 and decode_png(tiles[0]["bytes"]).shape == (396, 396, 4)
    sprites = out["sprites"].collect()
    assert {(s["area_id"], s["mode"]) for s in sprites} == {
        (0, "hover"), (0, "active"), (1, "hover"), (1, "active"),
    }
    atlas = out["atlas"].collect()
    assert atlas[0]["n_sprites"] == 4

    # resume: mtimes of every stage dir unchanged on rerun (pure cache hit)
    def tree_mtimes(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                p = os.path.join(dirpath, fn)
                out[p] = os.path.getmtime(p)
        return out

    before = tree_mtimes(store.root)
    out2 = render_scene_pipeline(spark, scene, _areas(spark), store)
    assert tree_mtimes(store.root) == before
    assert out2["atlas"].collect()[0]["n_sprites"] == 4


def test_pipeline_changed_areas_recompute(spark, store):
    """S10 stale-cache hazard: a changed AREAS input must change the
    sprite stage key — never serve the old sprites."""
    scene = ALL_SCENES["bridges"]()
    out1 = render_scene_pipeline(spark, scene, _areas(spark), store)
    assert out1["sprites"].count() == 4
    other_areas = spark.createDataFrame(
        [(0, 0, [(8.02, 50.02), (8.04, 50.02), (8.03, 50.04)])],
        "scene_id long, area_id long, polygon array<struct<lon:double,lat:double>>",
    )
    out2 = render_scene_pipeline(spark, scene, other_areas, store)
    assert out2["sprites"].count() == 2  # one area × two modes, recomputed


def test_project_ways_additive_kinds(spark):
    """Kind classification mirrors the reference's INDEPENDENT render
    passes: bridge∧water and coast∧water ways emit one row per matching
    pass (OsmRender.m:508-517 re-scans ALL ways with OsmIsWater)."""
    from pyspark.sql import functions as F

    from osm_render_spark.pipeline import project_ways

    rows = [
        (1, {"bridge": "yes", "natural": "water"}),     # water + bridge
        (2, {"natural": "coastline", "waterway": "riverbank"}),  # coast + water
        (3, {"bridge": "yes"}),                          # bridge only
        (4, {"natural": "coastline"}),                   # coast only
        (5, {"highway": "x"}),                           # legacy default water
    ]
    df = spark.createDataFrame(
        [(i, t, [{"lon": 0.5, "lat": 0.5}]) for i, t in rows],
        "way_id long, tags map<string,string>, "
        "geometry array<struct<lon: double, lat: double>>",
    )
    out = project_ways(df, (0.0, 0.0, 1.0, 1.0), 10, 10)
    kinds = {}
    for r in out.collect():
        kinds.setdefault(r["way_id"], set()).add(r["kind"])
    assert kinds == {
        1: {"water", "bridge"},
        2: {"water", "coast"},
        3: {"bridge"},
        4: {"coast"},
        5: {"water"},
    }


# ---------------------------------------------------------------------------
# training-data pipeline (images + captions)
# ---------------------------------------------------------------------------

def _run_training(spark, store, n=120):
    from osm_render_spark.fixtures.images import pipeline_corpus_df
    from osm_render_spark.pipeline import training_data_pipeline

    corpus = pipeline_corpus_df(spark, n)
    return training_data_pipeline(
        spark, corpus, store, params={"corpus": "planted", "n": n}
    )


def test_training_pipeline_end_to_end(spark, store):
    n = 120
    out = _run_training(spark, store, n)
    feats = {r["image_id"]: r for r in out["features"].collect()}
    assert len(feats) == n
    # dims-corrupt rows flagged
    bad = {f"img{i:010d}" for i in range(n) if i % 17 == 16}
    assert {k for k, r in feats.items() if not r["dims_ok"]} == bad

    curated = {r["image_id"]: r for r in out["curated"].collect()}
    # every dims-corrupt row is gone
    assert not bad & set(curated)
    # planted caption duplicates: the i%10==9 copy is dropped (canonical
    # min-id is i-1), unless i-1 itself was dropped for other reasons
    for i in range(1, n):
        a, b = f"img{i - 1:010d}", f"img{i:010d}"
        if i % 10 == 9 and a in curated:
            assert b not in curated, f"caption dup {b} survived"
        if i % 13 == 12 and a in curated:
            assert b not in curated, f"phash near-dup {b} survived"

    splits = {r["image_id"]: r["split"] for r in out["splits"].collect()}
    assert set(splits) == set(curated)
    assert set(splits.values()) <= {"train", "val", "test"}

    packed = out["packed"].collect()
    assert {r["image_id"] for r in packed} == set(curated)
    budget = 64
    by_seq = {}
    for r in packed:
        assert r["seq_fill"] <= budget
        by_seq.setdefault((r["bucket"], r["seq_idx"]), []).append(r)
        # bucket prefix is the split tag — packing never crosses splits
        assert r["bucket"].split("/")[0] == splits[r["image_id"]]
    for rows in by_seq.values():
        assert sorted(x["pos_in_seq"] for x in rows) == list(range(len(rows)))


def test_training_pipeline_resume_zero_recompute(spark, store, monkeypatch):
    """Kill-mid-pipeline resume: after a full run, wipe only the LAST
    stage's checkpoint (simulating a crash during pack) and rerun —
    completed stages must not recompute (spied at the operator level),
    and the recomputed pack output must equal the original."""
    import osm_render_spark.operators.dedup as dedup_mod
    import osm_render_spark.raster.ops as ops_mod

    out1 = _run_training(spark, store)
    want_packed = sorted(map(tuple, out1["packed"].collect()))

    calls = {"decode": 0, "dedup": 0}
    orig_decode = ops_mod.decode_features
    orig_dedup = dedup_mod.dedup_images

    def spy_decode(df):
        calls["decode"] += 1
        return orig_decode(df)

    def spy_dedup(*a, **k):
        calls["dedup"] += 1
        return orig_dedup(*a, **k)

    monkeypatch.setattr(ops_mod, "decode_features", spy_decode)
    monkeypatch.setattr(dedup_mod, "dedup_images", spy_dedup)

    # crash during the last stage: its checkpoint is incomplete/gone
    pack_dir = os.path.join(store.root, "pack")
    assert os.path.isdir(pack_dir)
    shutil.rmtree(pack_dir)

    out2 = _run_training(spark, store)
    assert calls == {"decode": 0, "dedup": 0}, "completed stages recomputed"
    assert sorted(map(tuple, out2["packed"].collect())) == want_packed

    # full rerun with nothing missing: still zero operator calls
    out3 = _run_training(spark, store)
    assert calls == {"decode": 0, "dedup": 0}
    assert sorted(map(tuple, out3["packed"].collect())) == want_packed


def test_training_pipeline_pixel_quality_stage(spark, store):
    """Optional quality stage: planted solid / letterboxed junk images
    are dropped before dedup; the good corpus is untouched; the stage
    key carries the thresholds so a re-run with different thresholds
    recomputes instead of serving the stale keeper set."""
    import numpy as np

    from osm_render_spark.fixtures.images import pipeline_corpus_df
    from osm_render_spark.pipeline import training_data_pipeline
    from osm_render_spark.raster.codec import encode_png, phash64

    n = 60
    corpus = pipeline_corpus_df(spark, n)
    junk_rows = []
    for j, img in enumerate(
        [np.full((48, 48, 3), 128, np.uint8),       # solid: entropy 0
         np.full((48, 48, 3), 250, np.uint8)]       # blown out: extreme
    ):
        junk_rows.append((
            f"junk{j}", bytearray(encode_png(img)), 48, 48, "png",
            f"unique junk caption number {j} with many tokens", phash64(img),
        ))
    full = corpus.unionByName(spark.createDataFrame(
        junk_rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    ))
    params = {"corpus": "planted+junk", "n": n}
    th = {"min_sharpness": 5.0, "min_entropy": 1.0, "max_extreme": 0.9}
    out = training_data_pipeline(
        spark, full, store, params, quality_thresholds=th
    )
    curated = {r["image_id"] for r in out["curated"].collect()}
    assert not {f"junk{j}" for j in range(2)} & curated
    # the quality gate dropped ONLY the junk: same survivors as a run
    # without the stage on the junk-free corpus
    base = training_data_pipeline(spark, corpus, store,
                                  {"corpus": "planted", "n": n})
    assert curated == {r["image_id"] for r in base["curated"].collect()}
    # loosened thresholds recompute (key carries them) and keep the junk
    # — junk0 only: the two solids phash-collide (both hash to 0), so
    # image dedup keeps the canonical min-id of that pair
    out2 = training_data_pipeline(
        spark, full, store, params,
        quality_thresholds={"min_sharpness": 0.0, "min_entropy": 0.0,
                            "max_extreme": 1.0,
                            "reject_uniform_border": False},
    )
    curated2 = {r["image_id"] for r in out2["curated"].collect()}
    assert "junk0" in curated2 and "junk1" not in curated2


def test_training_pipeline_quality_knob_does_not_serve_stale_checkpoint(
    spark, store
):
    """Review regression: quality_min_tokens shapes curate and every
    downstream stage — resuming with a different floor must recompute,
    never serve the old checkpoint."""
    from osm_render_spark.fixtures.images import pipeline_corpus_df
    from osm_render_spark.pipeline import training_data_pipeline

    corpus = pipeline_corpus_df(spark, 60)
    params = {"corpus": "planted", "n": 60}
    lo = training_data_pipeline(
        spark, corpus, store, params, quality_min_tokens=3
    )
    n_lo = lo["curated"].count()
    hi = training_data_pipeline(
        spark, corpus, store, params, quality_min_tokens=9
    )
    n_hi = hi["curated"].count()
    assert n_hi < n_lo  # captions are 8 tokens: floor 9 drops them all
    assert n_hi == 0
    assert hi["packed"].count() == 0


def test_training_pipeline_bpe_tokenize_stage(spark, store):
    """Optional BPE stage: n_tokens becomes the BPE token count (>= the
    whitespace count — characters merge at most back to words, and the
    </w> marker keeps every word >= 1 token), packing still respects the
    budget in the new units, and the stage key carries n_merges."""
    from osm_render_spark.fixtures.images import pipeline_corpus_df
    from osm_render_spark.operators.bpe import apply_bpe, train_bpe
    from osm_render_spark.pipeline import training_data_pipeline

    n = 60
    corpus = pipeline_corpus_df(spark, n)
    params = {"corpus": "planted", "n": n}
    base = training_data_pipeline(spark, corpus, store, params=params)
    out = training_data_pipeline(
        spark, corpus, store, params=params, bpe_merges_n=6
    )
    ws = {r["image_id"]: r["n_tokens"] for r in base["curated"].collect()}
    bpe = {r["image_id"]: r["n_tokens"] for r in out["curated"].collect()}
    assert set(ws) == set(bpe)
    assert all(bpe[k] >= ws[k] for k in ws)
    # the counts equal a direct train+apply over the same curated text
    cur = base["curated"].select("image_id", "caption")
    merges = train_bpe(cur, 6, text_col="caption")
    direct = {
        r["image_id"]: r["n_tokens"]
        for r in apply_bpe(cur, merges, text_col="caption", id_col="image_id").collect()
    }
    assert bpe == direct
    # packing uses the BPE units
    for r in out["packed"].collect():
        assert r["seq_fill"] <= 64
