"""Parquet-backed catalog / process-run / lineage store (SURVEY M2).

Re-expresses the reference's MySQL metadata layer (mysql_process.py):

- ``CATALOG.CATALOG``          → ``catalog``   (image catalog)
- ``CATALOG.PROC_EJECUCION``   → ``runs``      (process executions)
- ``CATALOG.DETALLE_EJECUCION``→ ``lineage``   (run ↔ image junction)

Design notes vs the reference:

- AUTO_INCREMENT + read-modify-write id allocation (``last_id``,
  mysql_process.py:13-25) is a single-writer bottleneck and a race; ids
  here are allocated per-batch, deterministically and WITHOUT a global
  single-partition window: a per-``indice`` partitioned ``row_number``
  plus driver-computed cumulative group offsets — the zipWithIndex
  pattern (see ``_with_ids``).
- Writer concurrency: the store assumes ONE writer at a time (the
  reference's cron posture — one script run per schedule). Two concurrent
  writers could mint colliding run/catalog ids (max+1 read-then-append)
  or race the version-pointer flip. Multi-writer coordination belongs to
  a table format with a transaction log (Delta/Iceberg — the documented
  production path); this plain-parquet emulation keeps the single-writer
  contract explicit instead of half-locking around it.
- ``update_processed_img`` (mysql_process.py:83-91) row-at-a-time UPDATE →
  a MERGE-shaped plan: anti-join the untouched rows, union the updated
  ones, overwrite. (Delta's MERGE INTO is the production path; plain
  parquet emulation keeps this container dependency-free — SURVEY §7 M2
  fallback.)
- the reference swallows insert errors (mysql_process.py:59-60); we don't.

Tables are plain parquet dirs under ``root``; every write goes through a
temp-dir + atomic rename pattern where overwrite is needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("indice", T.StringType(), True),
        T.StructField("codigo", T.StringType(), True),
        T.StructField("nombre_predio", T.StringType(), True),
        T.StructField("seccion", T.StringType(), True),
        T.StructField("especie", T.StringType(), True),
        T.StructField("apl", T.StringType(), True),
        T.StructField("id_tipo_img", T.IntegerType(), True),
        T.StructField("id_proceso", T.IntegerType(), True),
        T.StructField("ruta_resultado", T.StringType(), True),
        T.StructField("fecha", T.TimestampType(), True),
    ]
)

RUNS_SCHEMA = T.StructType(
    [
        T.StructField("id_ejecucion", T.LongType(), False),
        T.StructField("id_proceso", T.IntegerType(), True),
        T.StructField("fecha", T.TimestampType(), True),
        # streaming provenance: the foreachBatch batchId that produced this
        # run, null for ad-hoc runs. Keyed lookups make run creation
        # idempotent under micro-batch replay (crash between insert and
        # checkpoint commit re-delivers the same batchId).
        T.StructField("batch_id", T.LongType(), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("id_ejecucion", T.LongType(), False),
        T.StructField("id_imagen_fuente", T.LongType(), False),
    ]
)

#: id_tipo_img enum (script_geo.py:168-174, download_list_images.py:103)
TIPO_IMG_RAW_JPG = 0
TIPO_IMG_GEOTIFF = 3
TIPO_IMG_MODEL_OUTPUT = 10

#: id_proceso enum (script_geo.py:164, download_list_images.py:89)
PROCESO_INGEST = 0
PROCESO_MODEL_PUBLISH = 2


class CatalogStore:
    """Catalog + runs + lineage over parquet directories.

    The catalog table is SNAPSHOT-VERSIONED: inserts append to the
    current snapshot directory (``catalog_v{N}``); updates write a brand-
    new snapshot and flip an atomically-renamed pointer file. Readers
    therefore never observe a half-written state (the Delta-style
    copy-on-write contract on plain parquet), a crash mid-update leaves
    the previous snapshot intact, and old snapshots stay readable —
    ``catalog(version=N)`` is time travel.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---- paths -----------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _read(self, name: str, schema: T.StructType) -> DataFrame:
        path = self._path(name)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    # ---- catalog versioning ----------------------------------------------
    def current_version(self) -> int:
        ptr = self._path("catalog.version")
        if not os.path.exists(ptr):
            return 0
        with open(ptr) as f:
            return int(f.read().strip())

    def catalog_versions(self) -> list[int]:
        import re

        out = []
        for d in os.listdir(self.root):
            m = re.fullmatch(r"catalog_v(\d+)", d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _set_version(self, version: int) -> None:
        ptr = self._path("catalog.version")
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, ptr)  # atomic pointer flip

    def _catalog_dir(self, version: int | None = None) -> str:
        v = self.current_version() if version is None else version
        return self._path(f"catalog_v{v}")

    # ---- reads -----------------------------------------------------------
    def catalog(self, version: int | None = None) -> DataFrame:
        """The catalog snapshot — latest by default, or any retained
        ``version`` (time travel)."""
        path = self._catalog_dir(version)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], CATALOG_SCHEMA)
        return self.spark.read.schema(CATALOG_SCHEMA).parquet(path)

    def runs(self) -> DataFrame:
        return self._read("runs", RUNS_SCHEMA)

    def lineage(self) -> DataFrame:
        return self._read("lineage", LINEAGE_SCHEMA)

    def last_id(self) -> int:
        """A1: max catalog id (the reference's AUTO_INCREMENT peek,
        mysql_process.py:13-25, as a one-row aggregate). r19: an absent
        catalog snapshot is 0 without a Spark job (guide §5)."""
        if not os.path.exists(self._catalog_dir()):
            return 0
        row = self.catalog().agg(F.max("id").alias("m")).collect()[0]
        return int(row["m"]) if row["m"] is not None else 0

    # ---- writes ----------------------------------------------------------
    def start_run(self, id_proceso: int, batch_id: int | None = None) -> int:
        """S14: append a run row, return its id (mysql_process.py:28-43).

        With ``batch_id`` set (streaming foreachBatch), run creation is
        IDEMPOTENT: a replay of the same micro-batch finds the existing
        run row and reuses its id instead of appending a duplicate —
        the runs table stays exactly-once under crash-replay."""
        # r19 (guide §5 — the driver should do almost no data work): a
        # store with no runs file yet has nothing to look up; skipping
        # the two empty-relation aggregate jobs saves ~0.5 s per fresh
        # store lifecycle (the catalog fixture queries build one per run)
        have_runs = os.path.exists(self._path("runs"))
        if batch_id is not None and have_runs:
            row = (
                self.runs()
                .filter(F.col("batch_id") == batch_id)
                .agg(F.min("id_ejecucion").alias("m"))
                .collect()[0]
            )
            if row["m"] is not None:
                return int(row["m"])
        if have_runs:
            row = self.runs().agg(F.max("id_ejecucion").alias("m")).collect()[0]
            run_id = (int(row["m"]) if row["m"] is not None else 0) + 1
        else:
            run_id = 1
        run = self.spark.createDataFrame(
            [(run_id, id_proceso, batch_id)],
            "id_ejecucion long, id_proceso int, batch_id long",
        ).withColumn("fecha", F.current_timestamp())
        run.select("id_ejecucion", "id_proceso", "fecha", "batch_id").write.mode(
            "append"
        ).parquet(self._path("runs"))
        return run_id

    def _with_ids(self, rows: DataFrame, base: int) -> DataFrame:
        """Dense deterministic ids = ``base`` + global row_number over
        ``(indice, ruta_resultado)`` — allocated WITHOUT funnelling the
        batch through one task (no unpartitioned window over the batch),
        via the zipWithIndex pattern, entirely JVM-side:

        1. ``row_number`` partitioned BY ``indice`` (hash-distributed),
        2. per-``indice`` group counts — a tiny map-side-combined
           aggregate, one row per distinct ``indice``,
        3. exclusive running sum over that AGGREGATE in ``indice`` order
           (NULLS FIRST = Spark's ASC sort) → per-group offsets. This
           window is the plan's only SinglePartition exchange and it
           carries one row per distinct ``indice`` — never the batch —
           so it stays O(#groups) regardless of batch size, and nothing
           is collected to the driver,
        4. offsets broadcast-joined back onto the batch.

        Group-major layout + within-group order by ``ruta_resultado``
        equals the global ``(indice, ruta_resultado)`` ordering, so ids
        match a single global ``row_number`` exactly while every
        batch-side exchange stays hash-partitioned. Skew note: one
        degenerate hot ``indice`` can be subdivided by extending the
        group key with a ``ruta_resultado`` prefix — order-preserving
        because the within-group sort key extends the group key.
        """
        w_local = Window.partitionBy("indice").orderBy("ruta_resultado")
        w_off = Window.orderBy(F.col("indice").asc_nulls_first()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        off = (
            rows.groupBy("indice")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .select(
                F.col("indice").alias("__gk"),
                F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
            )
        )
        return (
            rows.withColumn("__rn", F.row_number().over(w_local))
            .join(F.broadcast(off), F.col("indice").eqNullSafe(F.col("__gk")))
            .withColumn("id", (F.lit(base) + F.col("__off") + F.col("__rn")).cast("long"))
            .drop("__gk", "__off", "__rn")
        )

    def insert_catalog(self, rows: DataFrame, run_id: int) -> DataFrame:
        """S13: append catalog rows + one lineage row each (J6).

        ``rows`` carries the CATALOG columns minus ``id``; ids are
        allocated as ``last_id + row_number over a deterministic order``
        with no read-modify-write per row (unlike mysql_process.py:46-61)
        and no single-partition exchange (``_with_ids``). ``rows`` is
        evaluated twice (group counts + the write) — persist upstream if
        it is expensive to recompute. Returns the inserted rows with ids.

        r20 (guide §1.2 don't compute twice): the lineage rows and the
        RETURNED frame derive from the snapshot rows just written
        (``id > base`` — ids are base + a dense row_number, and the
        store's single-writer contract means nothing else appended), not
        from the lazy id-allocation plan, which previously re-ran the
        whole window + offset-join pipeline once per write (catalog,
        then lineage, then once more per caller collect). The read-back
        is a small stats-bearing parquet scan.
        """
        base = self.last_id()
        with_id = self._with_ids(rows, base)
        ordered = with_id.select([f.name for f in CATALOG_SCHEMA.fields])
        ordered.write.mode("append").parquet(self._catalog_dir())
        written = self.catalog().filter(F.col("id") > base)
        lineage = written.select(
            F.lit(run_id).cast("long").alias("id_ejecucion"),
            F.col("id").alias("id_imagen_fuente"),
        )
        lineage.write.mode("append").parquet(self._path("lineage"))
        return written

    def update_processed_img(self, new_tipo_img: int, ids: list[int]) -> int:
        """S15: MERGE-shaped state advance (mysql_process.py:83-91).

        Copy-on-write: the merged rows are written to a NEW snapshot
        directory, then the version pointer flips atomically. Readers
        mid-update keep seeing the previous snapshot; a crash before the
        flip changes nothing. Returns the new version.

        r20 (guide §1.2 / §3): ONE scan + ONE broadcast left-join with a
        conditional column instead of the previous anti-join ∪ semi-join
        pair, which scanned (and joined) the full snapshot twice per
        MERGE. Row set is identical — the left join preserves every
        snapshot row exactly once and only flips ``id_tipo_img`` on
        hits (value-verified; same-session A/B min-of-3:
        catalog_snapshot_expire 4.31 → 3.85 s, diff 2.19 → 2.05 s).
        """
        if not ids:
            return self.current_version()  # no-op: don't burn a snapshot
        cat = self.catalog()
        updates = self.spark.createDataFrame([(int(i),) for i in ids], "id long")
        hit = F.broadcast(updates.withColumn("__hit", F.lit(1)))
        merged = (
            cat.join(hit, "id", "left")
            .withColumn(
                "id_tipo_img",
                F.when(
                    F.col("__hit").isNotNull(), F.lit(new_tipo_img).cast("int")
                ).otherwise(F.col("id_tipo_img")),
            )
            .drop("__hit")
            .select([f.name for f in CATALOG_SCHEMA.fields])
        )
        new_version = self.current_version() + 1
        merged.write.mode("overwrite").parquet(self._catalog_dir(new_version))
        self._set_version(new_version)
        return new_version

    # ---- queries ---------------------------------------------------------
    def filtered_paths(
        self, id_proceso: int, tipo_img: list[int], indice: str
    ) -> DataFrame:
        """The flagship J1 on the real domain tables (mysql_process.py:67-74):
        runs ⋈ lineage ⋈ catalog with P5 filters → (id, ruta_resultado)."""
        pe = self.runs()
        de = self.lineage()
        c = self.catalog()
        return (
            F.broadcast(pe.filter(F.col("id_proceso") == id_proceso))
            .join(de, "id_ejecucion")
            .join(c, de.id_imagen_fuente == c.id)
            .filter(F.col("id_tipo_img").isin(*tipo_img) & (F.col("indice") == indice))
            .select("id", "ruta_resultado")
        )
