"""End-to-end scene pipeline — the engine's `main` (reference
OsmRender.m:1177-1296, SURVEY.md §3.1), distributed and checkpointed.

Stages (each one a checkpointed unit; resume skips completed stages):

1. spatial join  — waysInRect over (nodes, ways, relations)      [M2]
2. projection    — lon/lat → scene pixel space (Column HOFs)     [M1]
3. base render   — per-scene raster kernel (clip/merge/fill)     [M5/M6]
4. sprite fan-out — per-(area, mode) variants + diffs            [A6/J10]
5. atlas         — per-scene packed sprite sheet                 [A5]

The cache probe the reference does per render (OsmRenderMapCached,
OsmRender.m:539-588) is the CheckpointStore key hit: rerunning with the
same params + inputs recomputes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures.osm import Scene
from .operators.ways_in_rect import ways_in_rect
from .plans.checkpoint import CheckpointStore
from .raster.ops import pack_atlas, render_map_tiles, sprite_variants


def project_ways(
    result: DataFrame, bbox: tuple[float, float, float, float], w: int, h: int,
    scene_id: int = 0,
) -> DataFrame:
    """Way rows → pixel-space (scene_id, way_id, kind, xs, ys). Pure
    Column HOFs (P8/P9); kind classification mirrors the render order of
    OsmRenderMap (bridges erase, coastline merges, water fills).

    Kinds are ADDITIVE per reference render pass — see
    predicates.classify_kinds (single shared definition)."""
    from .functions.predicates import classify_kinds

    lat_min, lon_min, lat_max, lon_max = bbox
    sx = w / (lon_max - lon_min)
    sy = h / (lat_min - lat_max)
    kinds = classify_kinds(F.col("tags"))
    return result.select(
        F.lit(scene_id).cast("long").alias("scene_id"),
        "way_id",
        F.explode(kinds).alias("kind"),
        F.transform("geometry", lambda p: (p["lon"] - F.lit(lon_min)) * F.lit(sx)).alias("xs"),
        F.transform("geometry", lambda p: (p["lat"] - F.lit(lat_max)) * F.lit(sy)).alias("ys"),
    )


def project_areas(
    areas: DataFrame, bbox: tuple[float, float, float, float], w: int, h: int
) -> DataFrame:
    """areas(scene_id, area_id, polygon:array<struct<lon,lat>>) → pixel
    xs/ys arrays for the sprite mask kernel."""
    lat_min, lon_min, lat_max, lon_max = bbox
    sx = w / (lon_max - lon_min)
    sy = h / (lat_min - lat_max)
    return areas.select(
        "scene_id",
        "area_id",
        F.transform("polygon", lambda p: (p["lon"] - F.lit(lon_min)) * F.lit(sx)).alias("xs"),
        F.transform("polygon", lambda p: (p["lat"] - F.lit(lat_max)) * F.lit(sy)).alias("ys"),
    )


def render_scene_pipeline(
    spark: SparkSession,
    scene: Scene,
    areas: DataFrame,
    store: CheckpointStore,
    w: int = 396,
    h: int = 396,
) -> dict[str, DataFrame]:
    """Full pipeline with per-stage checkpoints. Returns the stage outputs
    {ways, tiles, sprites, atlas}."""
    from .plans.checkpoint import dataframe_token

    nodes, ways, rels = scene.to_spark(spark)
    params = {"scene": scene.name, "bbox": list(scene.bbox), "w": w, "h": h}
    # input snapshot tokens (S10: a stage key must cover its INPUTS, not
    # just its parameters — the reference's stale-cache hazard). Scene
    # tables are a pure function of scene.name (fixtures contract), so
    # params covers them; areas is external input and gets a content token.
    areas_token = dataframe_token(areas)

    joined = store.run_stage(
        spark,
        "ways_in_rect",
        params,
        lambda: ways_in_rect(nodes, ways, rels, scene.bbox),
        partition_col="way_id",
    )
    proj = project_ways(joined, scene.bbox, w, h)
    tiles = store.run_stage(
        spark, "base_render", params, lambda: render_map_tiles(proj, w, h),
        partition_col="scene_id",
    )
    px_areas = project_areas(areas, scene.bbox, w, h)
    sprites = store.run_stage(
        spark,
        "sprites",
        params,
        lambda: sprite_variants(tiles, px_areas),
        partition_col="area_id",
        input_token=areas_token,
    )
    atlas = store.run_stage(
        spark,
        "atlas",
        params,
        lambda: pack_atlas(sprites),
        partition_col="scene_id",
        input_token=areas_token,
    )

    # second-resolution callout pass (OsmRender.m:1261-1291: globals mutate
    # to 290×290 and each area gets its own highlighted render)
    cw = ch = 290
    cparams = {**params, "w": cw, "h": ch}
    ctiles = store.run_stage(
        spark,
        "callout_base",
        cparams,
        lambda: render_map_tiles(project_ways(joined, scene.bbox, cw, ch), cw, ch),
        partition_col="scene_id",
    )
    callouts = store.run_stage(
        spark,
        "callouts",
        cparams,
        lambda: sprite_variants(
            ctiles, project_areas(areas, scene.bbox, cw, ch), modes=("active",)
        ).withColumn("mode", F.lit("callout")),
        partition_col="area_id",
        input_token=areas_token,
    )
    return {
        "ways": joined,
        "tiles": tiles,
        "sprites": sprites,
        "atlas": atlas,
        "callouts": callouts,
    }


def training_data_pipeline(
    spark: SparkSession,
    images: DataFrame,
    store: CheckpointStore,
    params: dict,
    pack_budget: int = 64,
    quality_min_tokens: int = 3,
    pack_shards: int = 8,
    embeddings: DataFrame | None = None,
    semdedup_threshold: float = 0.92,
    semdedup_clusters: int | None = None,
    quality_thresholds: dict | None = None,
    bpe_merges_n: int | None = None,
) -> dict[str, DataFrame]:
    """The composed multimodal TRAINING-DATA pipeline (the north rule's
    image+caption curation path), every heavy stage a checkpointed unit
    so a killed job resumes with zero recomputation of completed stages
    (pinned by tests/test_pipeline.py):

    1. decode_verify — decode/verify/feature Arrow kernel  [S8/R11]
    2. (inline)      — keep dims_ok AND phash-verified rows
    2b. quality      — optional pixel-quality gate (raster/quality.py:
                       blur/entropy/exposure/border thresholds), run
                       before dedup so junk never reaches a shuffle
    3. dedup         — exact caption dedup ∩ phash image dedup
                       (operators/dedup.dedup_images, canonical keep)
    4. curate        — langid + token count + quality floor
    4b. tokenize     — optional BPE stage (operators/bpe.py): train a
                       merge list on the curated captions and replace
                       whitespace n_tokens with BPE token counts, so
                       the pack budget is in real tokenizer units
    5. split         — deterministic train/val/test (codegen LCG)
    6. pack          — greedy sequence packing per (split, shard)

    ``params`` must identify the input corpus (S10 discipline: a stage
    key covers inputs, not just knobs — pass the generator seed/size, or
    a snapshot id for a real table).

    Export: feed the curated ids back to the input table and hand the
    result to ``sources.webdataset.write_webdataset`` for the standard
    tar-shard training packaging (deterministic shards + sha manifest).

    100 TB shape: every stage is a narrow map, a hash-agg on a fixed-
    width key, or an already-capped operator from the library; the only
    driver actions are dedup_images' edge-count gate and pack_sequences'
    bucket guard. Stage outputs land partitioned in the store, so each
    stage's reader starts from columnar parquet, not recomputation.
    """
    from .operators.dedup import dedup_images
    from .operators.packing import pack_sequences
    from .operators.sampling import split_tag
    from .operators.text import SPARK, langid_sql
    from .raster.ops import decode_features

    feats = store.run_stage(
        spark,
        "decode_verify",
        params,
        lambda: decode_features(images),
        partition_col="fmt",
    )
    ok_ids = feats.where(
        F.col("dims_ok") & F.coalesce(F.col("phash_ok"), F.lit(True))
    ).select("image_id")
    corpus = images.join(ok_ids, "image_id")

    if quality_thresholds is not None:
        # optional pixel-quality gate (raster/quality.py) BEFORE dedup:
        # blur/solid/over-exposed rows are the cheapest to reject, and
        # rejecting them first shrinks every downstream shuffle. The
        # stage key carries the thresholds (S10: keys cover every
        # output-shaping knob).
        from .raster.quality import image_quality, quality_keep

        qtparams = {**params, "quality": sorted(quality_thresholds.items())}

        def compute_quality():
            return (
                image_quality(corpus.select("image_id", "bytes", "fmt"))
                .where(quality_keep(**quality_thresholds))
                .select("image_id")
            )

        q_ids = store.run_stage(spark, "quality", qtparams, compute_quality)
        corpus = corpus.join(q_ids, "image_id")
        params = qtparams

    def compute_dedup():
        canon_text = (
            corpus.groupBy(F.sha2(F.col("caption"), 256).alias("_k"))
            .agg(F.min("image_id").alias("image_id"))
            .select("image_id")
        )
        canon_img = (
            dedup_images(corpus, id_col="image_id", hash_col="phash")
            .where(F.col("is_canonical"))
            .select("image_id")
        )
        return canon_text.join(canon_img, "image_id")

    kept = store.run_stage(spark, "dedup", params, compute_dedup)

    if embeddings is not None:
        # optional SemDeDup stage: embedding-space near-dup removal over
        # the exact-dedup survivors. ``embeddings`` is (image_id,
        # embedding array<float>); keepers are intersected into `kept`.
        # S10 discipline: the stage key carries every output-shaping knob.
        from .operators.similarity import semantic_dedup

        sparams = {
            **params,
            "sem_threshold": semdedup_threshold,
            "sem_clusters": semdedup_clusters,
        }

        def compute_semdedup():
            emb_kept = embeddings.join(kept, "image_id")
            return (
                semantic_dedup(
                    emb_kept,
                    threshold=semdedup_threshold,
                    n_clusters=semdedup_clusters,
                    id_col="image_id",
                )
                .where(F.col("keep"))
                .select("image_id")
            )

        kept = store.run_stage(spark, "semdedup", sparams, compute_semdedup)
        # downstream stage keys (curate/split/pack) must see the semdedup
        # knobs too — their outputs depend on the keeper set (S10: keys
        # cover every output-shaping knob, and keys are NOT input-chained)
        params = sparams

    words = "split(caption, ' ')"
    # S10 discipline: a stage key covers every knob that changes its
    # OUTPUT — quality_min_tokens shapes curate and everything after it
    # (review catch: resuming with a different floor must not serve the
    # old checkpoint)
    qparams = {**params, "min_tokens": quality_min_tokens}

    def compute_curate():
        return (
            corpus.join(kept, "image_id")
            .withColumn("lang_id", F.expr(langid_sql(SPARK, words)))
            .withColumn("n_tokens", F.expr(f"size({words})").cast("long"))
            .where(F.col("n_tokens") >= quality_min_tokens)
            .select("image_id", "caption", "phash", "lang_id", "n_tokens")
        )

    curated = store.run_stage(
        spark, "curate", qparams, compute_curate, partition_col="lang_id"
    )

    if bpe_merges_n is not None:
        # optional tokenizer stage: train a BPE vocabulary ON the curated
        # captions (operators/bpe.py — one corpus pass, vocab-sized merge
        # rounds) and replace the whitespace n_tokens with the BPE token
        # count, so the packing budget downstream is in REAL tokenizer
        # units. Stage key carries n_merges (S10: output-shaping knob).
        from .operators.bpe import apply_bpe, train_bpe

        bparams = {**qparams, "bpe_merges": bpe_merges_n}

        def compute_tokenize():
            merges = train_bpe(curated, bpe_merges_n, text_col="caption")
            toks = apply_bpe(
                curated, merges, text_col="caption", id_col="image_id"
            )
            return (
                curated.drop("n_tokens")
                .join(toks.select("image_id", "n_tokens"), "image_id")
                .select(
                    "image_id", "caption", "phash", "lang_id", "n_tokens"
                )
            )

        curated = store.run_stage(
            spark, "tokenize", bparams, compute_tokenize, partition_col=None
        )
        qparams = bparams

    def compute_split():
        # image_id is a string: derive the LCG's numeric id via xxhash64
        return split_tag(
            curated.withColumn("_sid", F.xxhash64("image_id")), id_col="_sid"
        ).drop("_sid")

    splits = store.run_stage(
        spark, "split", qparams, compute_split, partition_col="split"
    )

    def compute_pack():
        sharded = splits.withColumn(
            "_bucket",
            F.concat_ws(
                "/",
                F.col("split"),
                F.pmod(F.xxhash64("image_id"), F.lit(pack_shards)).cast("string"),
            ),
        )
        return pack_sequences(
            sharded,
            budget=pack_budget,
            id_col="image_id",
            size_col="n_tokens",
            bucket_col="_bucket",
        )

    packed = store.run_stage(
        spark,
        "pack",
        {**qparams, "budget": pack_budget, "shards": pack_shards},
        compute_pack,
        partition_col="bucket",
    )
    return {
        "features": feats,
        "kept_ids": kept,
        "curated": curated,
        "splits": splits,
        "packed": packed,
    }
