"""Storage introspection operators — parquet footer/manifest sweeps.

At 100 TB the planning layer runs on METADATA: a manifest sweep reads
each file's footer (a ranged GET against the file tail, ~KBs) and
gets row counts, row-group boundaries and per-column min/max without
touching row data — the facts behind partition pruning, scan
scheduling, compaction picking and Iceberg-style manifest stats. The
reference has no analogue (scrapy never plans over files); this is a
build-spec frontier operator like the transfer codecs.

Scale shape: the file list is a tiny DataFrame; the footer reads run
executor-side in one Arrow-batched stage (one ranged read per file,
``functions/miniparquet.py`` does the Thrift compact-protocol walk) —
a million-file sweep is one narrow map stage, no shuffle, no row-data
IO. The gate cross-checks the engine's OWN footer parse against the
data itself (COUNT/MIN/MAX per column via DuckDB), so a wrong varint,
field-id delta or PLAIN-stats decode fails the hash gate.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_FOOTER_SCHEMA = (
    "table_name string, col_name string, num_rows long, num_values long, "
    "n_row_groups long, min_str string, max_str string"
)

# columns whose footer stats are data-derivable in ANSI SQL: integer,
# double and SHORT varchar leaves (timestamps carry logical-type
# encodings and long text stats may be writer-truncated — excluded by
# listing, not by guessing)
FOOTER_STAT_COLUMNS: dict[str, list[str]] = {
    "documents": ["doc_id", "n_chars", "lang", "source"],
    "events": ["event_id", "user_id", "value", "event_type"],
    "orders": [
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
    ],
}


def _fmt(v, phys: str) -> str | None:
    if v is None:
        return None
    if phys in ("INT32", "INT64"):
        return str(int(v))
    if phys in ("DOUBLE", "FLOAT"):
        # parquet-format recommends writers widen zero stats to
        # -0.0 (min) / +0.0 (max); IEEE -0.0 == 0.0, so render the
        # normalized zero (+ 0.0 maps -0.0 to +0.0, leaves all else)
        return f"{float(v) + 0.0:.6f}"
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return str(v)


def parquet_footer_stats(
    spark: SparkSession, sf_dir: str,
    tables: dict[str, list[str]] | None = None,
) -> DataFrame:
    """(table_name, column, num_rows, num_values, n_row_groups,
    min_str, max_str) — one row per selected leaf column, parsed from
    each file's FOOTER ONLY with the engine's own Thrift walk; stats
    aggregated across row groups (sum of num_values, min of mins, max
    of maxs — exactly what a manifest-level pruner keeps)."""
    tables = tables or FOOTER_STAT_COLUMNS
    files = spark.createDataFrame(
        [(t, f"{sf_dir}/{t}.parquet", cols)
         for t, cols in sorted(tables.items())],
        "table_name string, path string, cols array<string>",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import miniparquet as mp

        for pdf in it:
            out = {k: [] for k in (
                "table_name", "col_name", "num_rows", "num_values",
                "n_row_groups", "min_str", "max_str")}
            for tname, path, cols in zip(
                pdf["table_name"], pdf["path"], pdf["cols"]
            ):
                footer = mp.read_footer_from_file(str(path))
                want = set(cols)
                agg: dict[str, dict] = {}
                for rg in footer["row_groups"]:
                    for c in rg["columns"]:
                        if c["path"] not in want:
                            continue
                        a = agg.setdefault(
                            c["path"],
                            {"num_values": 0, "min": None, "max": None,
                             "type": c["type"]},
                        )
                        a["num_values"] += c["num_values"] or 0
                        if c["min"] is not None and (
                            a["min"] is None or c["min"] < a["min"]
                        ):
                            a["min"] = c["min"]
                        if c["max"] is not None and (
                            a["max"] is None or c["max"] > a["max"]
                        ):
                            a["max"] = c["max"]
                for col in cols:
                    a = agg.get(col)
                    out["table_name"].append(str(tname))
                    out["col_name"].append(str(col))
                    out["num_rows"].append(footer["num_rows"])
                    out["num_values"].append(
                        a["num_values"] if a else None)
                    out["n_row_groups"].append(len(footer["row_groups"]))
                    out["min_str"].append(
                        _fmt(a["min"], a["type"]) if a else None)
                    out["max_str"].append(
                        _fmt(a["max"], a["type"]) if a else None)
            yield pd.DataFrame(out)

    return files.repartition(4, "table_name").mapInPandas(
        batches, schema=_FOOTER_SCHEMA
    )


def parquet_footer_sql(tables: dict[str, list[str]] | None = None) -> str:
    """Closed-form oracle: every emitted footer fact is re-derivable
    from the DATA — COUNT(*) for num_rows/num_values (flat columns
    count nulls in num_values too), MIN/MAX per column (doubles
    rendered %.6f on both sides, parquet BYTE_ARRAY stats order is
    unsigned-lexicographic which matches DuckDB's binary collation on
    the ASCII columns checked). n_row_groups is 1 at gate scale
    (arrow-cpp's 1Mi-row default row-group size vs <=600k-row gate
    tables) — stated, not assumed, by the WHERE in the gate's tests."""
    tables = tables or FOOTER_STAT_COLUMNS
    parts = []
    for t, cols in sorted(tables.items()):
        for c in cols:
            parts.append(f"""
    SELECT '{t}' AS table_name, '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS num_rows,
           CAST(COUNT(*) AS BIGINT) AS num_values,
           CAST(1 AS BIGINT) AS n_row_groups,
           CASE WHEN typeof(MIN({c})) = 'DOUBLE'
                THEN printf('%.6f', MIN({c}))
                ELSE CAST(MIN({c}) AS VARCHAR) END AS min_str,
           CASE WHEN typeof(MAX({c})) = 'DOUBLE'
                THEN printf('%.6f', MAX({c}))
                ELSE CAST(MAX({c}) AS VARCHAR) END AS max_str
    FROM {t}""")
    return (
        "\nUNION ALL\n".join(parts)
        + "\nORDER BY table_name, col_name"
    )


# ---------------------------------------------------------------------------
# Merkle corpus digest — hierarchical content hashing (Merkle 1987),
# the integrity/diff structure behind Iceberg manifest lists, git
# trees and Dat/IPFS blob stores. Two corpus snapshots at 100 TB are
# compared WITHOUT re-reading rows: equal subtree digests prune the
# descent, so a point edit costs O(fanout * depth) digest reads.
#
# Scale shape: depth-3 tree with fanout 16 on doc_id — each level is
# ONE map-side-combinable groupBy whose collect_list is bounded by
# the FANOUT (never by data size), the tree-reduction shape. Digests
# are h60 over the ','-joined ordered child digests; ordering is by
# child key (array_sort on (key, digest) structs / string_agg ORDER
# BY), so both engines fold in the identical order — the ordered-
# fold rule for anything feeding a hash.
# ---------------------------------------------------------------------------

MERKLE_FANOUT = 16


def merkle_digest(docs: "DataFrame") -> "DataFrame":
    """(level, bucket, digest): level 0 = per-doc leaf digests
    h60(doc_id ':' text), levels 1..2 = fanout-16 interior nodes,
    level 3 = the corpus root."""
    from pyspark.sql import functions as F

    from ..functions.hashing import h60_col

    f = MERKLE_FANOUT

    def interior(child: "DataFrame", key: str, parent: str) -> "DataFrame":
        ordered = F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(key, "dig"))
                ),
                lambda s: s["dig"].cast("string"),
            ),
            ",",
        )
        return child.groupBy(parent).agg(h60_col(ordered).alias("dig"))

    l0 = docs.select(
        F.col("doc_id"),
        F.expr(f"doc_id div {f}").alias("b1"),
        h60_col(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
        ).alias("dig"),
    )
    l1 = interior(l0, "doc_id", "b1").withColumn(
        "b2", F.expr(f"b1 div {f}")
    )
    l2 = interior(l1, "b1", "b2").withColumn("r", F.lit(0))
    root = interior(l2, "b2", "r")

    def leveled(df: "DataFrame", level: int, bucket: str) -> "DataFrame":
        return df.select(
            F.lit(level).cast("long").alias("level"),
            F.col(bucket).cast("long").alias("bucket"),
            F.col("dig").alias("digest"),
        )

    return (
        leveled(l0, 0, "doc_id")
        .unionByName(leveled(l1, 1, "b1"))
        .unionByName(leveled(l2, 2, "b2"))
        .unionByName(leveled(root, 3, "r"))
    )


def merkle_digest_sql(rel: str = "documents") -> str:
    from ..functions.hashing import h60_sql

    f = MERKLE_FANOUT

    def agg(order_key: str) -> str:
        return h60_sql(
            f"string_agg(CAST(dig AS VARCHAR), ',' ORDER BY {order_key})"
        )

    leaf = h60_sql("CAST(doc_id AS VARCHAR) || ':' || text")
    return f"""
    WITH l0 AS (
      SELECT doc_id, doc_id // {f} AS b1, {leaf} AS dig FROM {rel}),
    l1 AS (
      SELECT b1, b1 // {f} AS b2, {agg("doc_id")} AS dig
      FROM l0 GROUP BY b1),
    l2 AS (SELECT b2, {agg("b1")} AS dig FROM l1 GROUP BY b2),
    root AS (SELECT {agg("b2")} AS dig FROM l2)
    SELECT CAST(0 AS BIGINT) AS level, CAST(doc_id AS BIGINT) AS bucket,
           dig AS digest FROM l0
    UNION ALL SELECT 1, b1, dig FROM l1
    UNION ALL SELECT 2, b2, dig FROM l2
    UNION ALL SELECT 3, 0, dig FROM root
    ORDER BY level, bucket
    """


# ---------------------------------------------------------------------------
# ORC footer sweep — the ORC sibling of parquet_footer_stats. Same
# 100 TB manifest-sweep contract (one ranged tail-GET per file, never
# row data), different wire format: ORC footers are PROTOBUF, walked
# by the engine's own decoder (functions/miniorc.py), with the footer
# chunk framing decompressed by the engine's OWN codec stack (raw
# deflate / snappy block / zstd frame / lz4 block). Files are written
# by the REAL Apache ORC writer (pyarrow.orc), compression cycling
# per file so all four own decoders sit in one gate's corpus.
# ---------------------------------------------------------------------------

ORC_CODEC_CYCLE = ["ZLIB", "SNAPPY", "ZSTD", "LZ4"]
ORC_FOOTER_COLUMNS = ["doc_id", "n_chars", "lang", "source"]


def synth_orc_from_docs(
    documents: DataFrame, docs_per_file: int = 100
) -> DataFrame:
    """One REAL ORC file blob per doc_id//docs_per_file group over
    (doc_id, n_chars, lang, source), compression = ORC_CODEC_CYCLE[
    file_id % 4] — deterministic corpus, real writer."""
    import io

    from pyspark.sql import functions as F

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.orc as orc

        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["file_id"].iloc[0])
        t = pa.table(
            {
                "doc_id": pa.array(pdf["doc_id"], pa.int64()),
                "n_chars": pa.array(pdf["n_chars"], pa.int64()),
                "lang": pa.array(pdf["lang"], pa.string()),
                "source": pa.array(pdf["source"], pa.string()),
            }
        )
        buf = io.BytesIO()
        orc.write_table(t, buf, compression=ORC_CODEC_CYCLE[fid % 4])
        return pd.DataFrame({"file_id": [fid], "data": [buf.getvalue()]})

    return (
        documents.select(
            "doc_id", "n_chars", "lang", "source",
            (F.col("doc_id") / docs_per_file).cast("long").alias("file_id"),
        )
        .groupBy("file_id")
        .applyInPandas(build, schema="file_id long, data binary")
    )


_ORC_PERFILE_SCHEMA = (
    "file_id long, col_name string, kind string, codec string, "
    "num_rows long, num_values long, min_int long, max_int long, "
    "sum_int long, min_s string, max_s string"
)


def orc_footer_stats(blobs: DataFrame) -> DataFrame:
    """ORC manifest sweep: per-blob footer walk (map stage, no row
    data decoded) -> per-column aggregation across files (min of
    mins / max of maxs / summed counts — what a manifest-level
    pruner keeps). Output: (col_name, kind, num_rows, num_values,
    n_files, n_codecs, min_str, max_str, sum_val); sum_val is the
    footer's IntegerStatistics.sum for int columns and
    StringStatistics.sum (total value BYTES) for string columns —
    both zigzag varints, so the sint64 decode is load-bearing."""
    from pyspark.sql import functions as F

    def sweep(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import miniorc

        for pdf in it:
            rows = []
            for fid, blob in zip(pdf["file_id"], pdf["data"]):
                ft = miniorc.parse_orc_tail(bytes(blob))
                assert sum(s.num_rows for s in ft.stripes) == ft.num_rows
                for i, col in enumerate(ft.column_names):
                    st = ft.statistics[i + 1]  # 0 = root struct
                    is_int = st.kind == "int"
                    # st.total is an integer for BOTH kinds: the
                    # IntegerStatistics sum, or StringStatistics'
                    # total value bytes — one BIGINT slot serves both
                    rows.append(
                        (
                            int(fid), col, ft.column_kinds[i + 1],
                            ft.compression, ft.num_rows, st.num_values,
                            st.minimum if is_int else None,
                            st.maximum if is_int else None,
                            st.total,
                            None if is_int else st.minimum,
                            None if is_int else st.maximum,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "col_name", "kind", "codec", "num_rows",
                    "num_values", "min_int", "max_int", "sum_int",
                    "min_s", "max_s",
                ],
            )

    per_file = blobs.mapInPandas(sweep, schema=_ORC_PERFILE_SCHEMA)
    return per_file.groupBy("col_name", "kind").agg(
        F.sum("num_rows").alias("num_rows"),
        F.sum("num_values").alias("num_values"),
        F.count(F.lit(1)).alias("n_files"),
        F.count_distinct("codec").alias("n_codecs"),
        F.coalesce(
            F.min("min_int").cast("string"), F.min("min_s")
        ).alias("min_str"),
        F.coalesce(
            F.max("max_int").cast("string"), F.max("max_s")
        ).alias("max_str"),
        F.sum("sum_int").alias("sum_val"),
    )


def orc_footer_sql(docs_per_file: int = 100) -> str:
    """Closed-form oracle: every footer fact re-derived from the data
    (COUNT/MIN/MAX/SUM; string sum_val = total utf-8 BYTES per the
    ORC StringStatistics.sum contract)."""
    parts = []
    for c in ("doc_id", "n_chars"):
        parts.append(f"""
    SELECT '{c}' AS col_name, 'LONG' AS kind,
           CAST(COUNT(*) AS BIGINT) AS num_rows,
           CAST(COUNT(*) AS BIGINT) AS num_values,
           CAST(COUNT(DISTINCT doc_id // {docs_per_file}) AS BIGINT)
             AS n_files,
           CAST(LEAST(4, COUNT(DISTINCT doc_id // {docs_per_file}))
             AS BIGINT) AS n_codecs,
           CAST(MIN({c}) AS VARCHAR) AS min_str,
           CAST(MAX({c}) AS VARCHAR) AS max_str,
           CAST(SUM({c}) AS BIGINT) AS sum_val
    FROM documents""")
    for c in ("lang", "source"):
        parts.append(f"""
    SELECT '{c}' AS col_name, 'STRING' AS kind,
           CAST(COUNT(*) AS BIGINT) AS num_rows,
           CAST(COUNT(*) AS BIGINT) AS num_values,
           CAST(COUNT(DISTINCT doc_id // {docs_per_file}) AS BIGINT)
             AS n_files,
           CAST(LEAST(4, COUNT(DISTINCT doc_id // {docs_per_file}))
             AS BIGINT) AS n_codecs,
           MIN({c}) AS min_str,
           MAX({c}) AS max_str,
           CAST(SUM(octet_length(encode({c}))) AS BIGINT) AS sum_val
    FROM documents""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


# --------------------------------------------------------- log replay


def delta_log_replay(actions: DataFrame) -> DataFrame:
    """Transaction-log replay — Delta Lake's InMemoryLogReplay /
    Iceberg's snapshot resolution, relationally: table state = per
    path, the HIGHEST-version action wins (add => live file,
    remove => tombstoned), dataChange history before it irrelevant.
    A path may be re-added after a remove (compaction rewrites,
    un-delete) with a different size — last-writer-wins must carry
    the WINNING action's attributes, not the first add's.

    Input: (version long, action string in {'add','remove'},
    path string, part long, size_bytes long), (path, version) unique.
    Output: per-partition live-file accounting
    (part, n_files, total_bytes, max_add_version).

    Scale shape: ONE shuffle on path (max_by groupBy — map-side
    combinable), then a tiny combinable per-part rollup. At 10^8 log
    actions this is exactly the one-pass replay a driver-side
    version-ordered HashMap fold cannot do distributed; checkpoints
    (see tests) cut the left edge of the scan, same as Delta's
    _last_checkpoint.
    """
    from pyspark.sql import functions as F

    last = actions.groupBy("path").agg(
        F.max_by(
            F.struct("action", "part", "size_bytes", "version"), "version"
        ).alias("w")
    )
    return (
        last.filter(F.col("w.action") == "add")
        .groupBy(F.col("w.part").alias("part"))
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("w.size_bytes").cast("bigint").alias("total_bytes"),
            F.max("w.version").cast("bigint").alias("max_add_version"),
        )
    )


def delta_checkpoint(actions: DataFrame, upto_version: int) -> DataFrame:
    """Materialize the snapshot at ``upto_version`` as pure add
    actions (Delta's checkpoint parquet): the live set of the log
    prefix, attributes from each path's winning action. Replaying
    (checkpoint UNION tail) must equal replaying the full log — the
    invariant tests pin."""
    from pyspark.sql import functions as F

    pre = actions.filter(F.col("version") <= upto_version)
    last = pre.groupBy("path").agg(
        F.max_by(
            F.struct("action", "part", "size_bytes", "version"), "version"
        ).alias("w")
    )
    return last.filter(F.col("w.action") == "add").select(
        F.col("w.version").alias("version"),
        F.lit("add").alias("action"),
        "path",
        F.col("w.part").alias("part"),
        F.col("w.size_bytes").alias("size_bytes"),
    )


def delta_log_replay_sql(actions_sql: str) -> str:
    """DuckDB mirror: identical last-writer-wins via a version-desc
    row_number window."""
    return f"""
    WITH actions AS ({actions_sql}),
    last AS (
      SELECT *, row_number() OVER (PARTITION BY path ORDER BY version DESC)
             AS rn
      FROM actions),
    live AS (SELECT * FROM last WHERE rn = 1 AND action = 'add')
    SELECT part, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
           CAST(max(version) AS BIGINT) AS max_add_version
    FROM live GROUP BY part
    """


# ---------------------------------------------------------- z-order


def zorder_file_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    file_rows: int,
    bits: int = 8,
    qx: tuple[int, int] = (64, 127),
    qy: tuple[int, int] = (0, 63),
) -> DataFrame:
    """Z-order (Morton) data layout + the min/max pruning payoff it
    exists for (Morton 1966; the Delta OPTIMIZE ZORDER / Databricks
    liquid-clustering pass): interleave ``bits`` bits of two integer
    columns into the Morton code, lay rows into fixed-size files in
    z order, and emit each file's (min/max x, min/max y) zone map
    plus whether a rectangle query would have to touch it. Because
    the z curve keeps both dimensions locally dense, a rectangle
    touches O(perimeter) files instead of the O(n_files) a
    single-column sort costs the other dimension — pinned by the
    linear-layout comparison in tests.

    Everything is integer arithmetic (bit shifts + masks both
    engines agree on to the byte). Scale shape: the interleave is a
    native projection in whole-stage codegen; the file assignment is
    ONE global sort by (z, x, y) — exactly the shuffle OPTIMIZE
    ZORDER pays — and the zone map is a combinable per-file groupBy.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(F.col(x_col), b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(
                F.shiftright(F.col(y_col), b).bitwiseAND(F.lit(1)), 2 * b + 1
            )
        )
    # The global z-order file assignment runs the two-phase
    # enumeration device (data_shuffle_epoch / crawl _fetch_seq): a
    # z-order layout job is exactly the thing run over the FULL
    # corpus, so a partition-less row_number() here would serialize
    # the whole table on one task (VERDICT r4 ask #4).
    # repartitionByRange on (z, x, y) gives ordered partitions; rank
    # locally; per-partition exclusive offsets come from a tiny
    # (n_parts)-row cumulative sum broadcast back. Range partition
    # ids are monotone in the sort key, so offset + local rank == the
    # global rank exactly.
    pts = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .withColumn("z", z)
        .repartitionByRange(32, "z", "x", "y")
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy("z", "x", "y")
    local = pts.withColumn("_lrn", F.row_number().over(w_local))
    sizes = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = (
        Window.partitionBy(F.lit(0))  # bounded: n_parts rows
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "file_id",
            ((F.col("_off") + F.col("_lrn") - 1) / file_rows).cast("long"),
        )
        .groupBy("file_id")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .withColumn(
            "touched",
            (F.col("min_x") <= qx[1])
            & (F.col("max_x") >= qx[0])
            & (F.col("min_y") <= qy[1])
            & (F.col("max_y") >= qy[0]),
        )
    )


def zorder_file_stats_sql(
    rel_sql: str,
    file_rows: int,
    bits: int = 8,
    qx: tuple[int, int] = (64, 127),
    qy: tuple[int, int] = (0, 63),
) -> str:
    """DuckDB mirror — identical interleave and file assignment."""
    z = " + ".join(
        f"(((x >> {b}) & 1) << {2 * b}) + (((y >> {b}) & 1) << {2 * b + 1})"
        for b in range(bits)
    )
    return f"""
    WITH pts AS ({rel_sql}),
    zz AS (SELECT x, y, {z} AS z FROM pts),
    files AS (
      SELECT x, y,
             CAST((row_number() OVER (ORDER BY z, x, y) - 1)
                  // {file_rows} AS BIGINT) AS file_id
      FROM zz),
    zone AS (
      SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y
      FROM files GROUP BY file_id)
    SELECT *, (min_x <= {qx[1]} AND max_x >= {qx[0]}
               AND min_y <= {qy[1]} AND max_y >= {qy[0]}) AS touched
    FROM zone
    """


def synth_proto_blobs(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — one protobuf Fetch record per doc, fields
    deterministic in doc_id; every blob plants unknown fields of all
    three skippable wire types mid-message (the spec's forward-compat
    skip rule is load-bearing), and delta rotates negative so zigzag
    is too."""
    import pandas as pd

    from ..functions import miniproto

    def batches(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ids.append(d)
                payloads.append(
                    miniproto.encode_fetch(
                        rec_id=d,
                        url=f"https://h{d % 50}.example.org/p/{d}",
                        status=[200, 301, 404, 503][d % 4],
                        delta=(d % 21) - 10,
                        content_type=f"text/ct{d % 3}",
                        size=100 + d % 900,
                        tags=[d % 5, d % 7, d % 11],
                        score=(d % 10) + 0.5,
                        crc=(d * 2654435761) % (1 << 32),
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def proto_decode(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> decoded Fetch fields through the OWN wire
    walk (functions/miniproto.decode_fetch). One Arrow-batched map
    stage, no shuffle; packed repeated tags re-emitted as a
    comma-joined string so both engines compare text."""
    import pandas as pd

    from ..functions import miniproto

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = miniproto.decode_fetch(bytes(blob))
                rows.append(
                    (
                        int(d), int(m["rec_id"]), m["url"],
                        int(m["status"]), int(m["delta"]),
                        m["content_type"], int(m["size"]),
                        ",".join(str(t) for t in m["tags"]),
                        float(m["score"]), int(m["crc"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "rec_id", "url", "status", "delta",
                    "content_type", "size", "tags", "score", "crc",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, rec_id long, url string, status int, "
            "delta long, content_type string, size int, tags string, "
            "score double, crc long"
        ),
    )


def synth_cbor_blobs(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — one CBOR event record per doc; arrays are
    INDEFINITE-length on odd docs (the 0x9f..0xff break rule carries
    corpus on both paths), a negint field exercises major type 1,
    ratio is a dyadic rational (exact float64 in both engines)."""
    import pandas as pd

    from ..functions import minicbor

    def batches(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rec = {
                    "url": f"https://h{d % 50}.example.org/p/{d}",
                    "status": [200, 301, 404, 503][d % 4],
                    "delta": (d % 21) - 10,
                    "ok": d % 3 == 0,
                    "note": None if d % 4 == 0 else f"n{d % 6}",
                    "tags": [d % 5, d % 7, d % 11],
                    "meta": {"ct": f"text/ct{d % 3}", "size": 100 + d % 900},
                    "ratio": (d % 16) / 16.0,
                }
                ids.append(d)
                payloads.append(
                    minicbor.encode(rec, indefinite_arrays=d % 2 == 1)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def cbor_decode(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> decoded record fields through the OWN
    RFC 8949 walk (functions/minicbor.decode). One Arrow-batched map
    stage, no shuffle."""
    import pandas as pd

    from ..functions import minicbor

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = minicbor.decode(bytes(blob))
                rows.append(
                    (
                        int(d), m["url"], int(m["status"]),
                        int(m["delta"]), bool(m["ok"]), m["note"],
                        ",".join(str(t) for t in m["tags"]),
                        m["meta"]["ct"], int(m["meta"]["size"]),
                        float(m["ratio"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "url", "status", "delta", "ok", "note",
                    "tags", "ct", "size", "ratio",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, url string, status int, delta long, "
            "ok boolean, note string, tags string, ct string, "
            "size int, ratio double"
        ),
    )


# ---------------------------------------------------------------------------
# Iceberg-style scan planning (Apache Iceberg table spec v2,
# https://iceberg.apache.org/spec/) — the north rule frames the
# corpus as "Iceberg tables of Common-Crawl-style web pages"; this
# is the metadata walk a reader performs BEFORE any data I/O: a
# manifest LIST (avro container) whose per-manifest partition
# summaries prune whole manifests, then the surviving MANIFEST files
# (avro containers) whose per-data-file column stats (lower/upper
# bounds) prune individual files.  At 10^10 rows the scan-planning
# tier is what keeps a ts-range + partition query from touching all
# N-million data files.  Both container tiers are read through the
# OWN avro OCF walk (functions/miniavro — sync markers verified,
# zigzag varints), mirroring plans/store.py's manifest-last design.
# ---------------------------------------------------------------------------

_ML_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "added_files_count", "type": "long"},
        {"name": "min_part", "type": "long"},
        {"name": "max_part", "type": "long"},
    ],
}

_MF_SCHEMA = {
    "type": "record",
    "name": "data_file",
    "fields": [
        {"name": "file_path", "type": "string"},
        {"name": "partition", "type": "long"},
        {"name": "record_count", "type": "long"},
        {"name": "min_ts", "type": "long"},
        {"name": "max_ts", "type": "long"},
        {"name": "null_count", "type": "long"},
    ],
}


def synth_iceberg_meta(docs: "DataFrame") -> "DataFrame":
    """One tiny Iceberg metadata tree per doc: a manifest list over 3
    manifests (one partition each), each holding 1-3 data files with
    ts lower/upper bounds, plus the scan predicate (partition equality
    + ts range) the planner must apply.  Bounds are arranged so BOTH
    stats ends prune real files (low-f files fail the lower bound on
    some docs, f=2 files always fail the upper)."""
    import pandas as pd

    from ..functions import miniavro

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                mpaths, mblobs, ml_records = [], [], []
                for m in range(3):
                    n_files = 1 + (d + m) % 3
                    files = []
                    for f in range(n_files):
                        min_ts = 100 * m + 10 * f + d % 10
                        files.append(
                            {
                                "file_path": (
                                    f"warehouse/doc{d}/m{m}/f{f}.parquet"
                                ),
                                "partition": m,
                                "record_count": 100
                                + (d + 31 * m + 7 * f) % 400,
                                "min_ts": min_ts,
                                "max_ts": min_ts + 5 + (d + f) % 5,
                                "null_count": (d + f) % 3,
                            }
                        )
                    path = f"warehouse/doc{d}/meta/m{m}.avro"
                    mpaths.append(path)
                    mblobs.append(
                        miniavro.write_ocf(
                            files, _MF_SCHEMA,
                            sync=bytes([m]) * 16,
                        )
                    )
                    ml_records.append(
                        {
                            "manifest_path": path,
                            "added_files_count": n_files,
                            "min_part": m,
                            "max_part": m,
                        }
                    )
                manifest_list = miniavro.write_ocf(
                    ml_records, _ML_SCHEMA, sync=b"\xab" * 16
                )
                part_pred = d % 3
                ts_lo = 100 * part_pred + 7
                rows.append(
                    (
                        d, manifest_list, mpaths, mblobs,
                        part_pred, ts_lo, ts_lo + 12,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "manifest_list", "mpaths", "mblobs",
                    "part_pred", "ts_lo", "ts_hi",
                ],
            )

    return docs.select("doc_id").mapInPandas(
        batches,
        schema=(
            "doc_id long, manifest_list binary, mpaths array<string>, "
            "mblobs array<binary>, part_pred long, ts_lo long, "
            "ts_hi long"
        ),
    )


def iceberg_scan_plan(meta: "DataFrame") -> "DataFrame":
    """Two-tier scan planning: manifest-list partition summaries
    prune manifests WITHOUT opening them (only pruned-in manifest
    blobs are decoded — asserted by never touching the others), then
    per-file [min_ts, max_ts] bounds prune data files against the
    ts-range predicate.  Emits the surviving files — the read set a
    distributed scan would fan out over.  One Arrow map stage."""
    import pandas as pd

    from ..functions import miniavro

    def plan(it):
        for pdf in it:
            rows = []
            for (
                d, ml, mpaths, mblobs, part_pred, ts_lo, ts_hi,
            ) in zip(
                pdf["doc_id"], pdf["manifest_list"], pdf["mpaths"],
                pdf["mblobs"], pdf["part_pred"], pdf["ts_lo"],
                pdf["ts_hi"],
            ):
                blob_by_path = {
                    p: b for p, b in zip(list(mpaths), list(mblobs))
                }
                _, manifests = miniavro.read_ocf(bytes(ml))
                for mrec in manifests:
                    if not (
                        mrec["min_part"] <= part_pred <= mrec["max_part"]
                    ):
                        continue  # pruned: manifest never opened
                    _, files = miniavro.read_ocf(
                        bytes(blob_by_path[mrec["manifest_path"]])
                    )
                    for frec in files:
                        if frec["partition"] != part_pred:
                            continue
                        if frec["min_ts"] > ts_hi or frec["max_ts"] < ts_lo:
                            continue  # stats-pruned
                        rows.append(
                            (
                                int(d),
                                frec["file_path"],
                                int(frec["partition"]),
                                int(frec["record_count"]),
                                int(frec["min_ts"]),
                                int(frec["max_ts"]),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "file_path", "part",
                    "record_count", "min_ts", "max_ts",
                ],
            )

    return meta.mapInPandas(
        plan,
        schema=(
            "doc_id long, file_path string, part long, "
            "record_count long, min_ts long, max_ts long"
        ),
    )


# ---------------------------------------------------------------------------
# SQLite database-file walk (sqlite.org/fileformat2.html) — the
# row-store sidecar format a web corpus actually contains.
# ---------------------------------------------------------------------------


def synth_sqlite_blobs(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — one tiny .sqlite database per doc through
    the OWN builder (functions/minisqlite): page 1 header+schema,
    interior root, 1-2 leaves; integer values span serial-type
    widths 1/2/3/4/5 plus the 0/1 constant types 8/9, with NULLs."""
    import pandas as pd

    from ..functions import minisqlite as sq

    def batches(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 3 + d % 5
                rows = []
                for i in range(n):
                    mag = (1, 100, 100000)[i % 3]
                    rows.append(
                        (
                            i + 1,
                            [
                                d * 10 + i,
                                f"r{d % 7}-{i}",
                                (i + d) % 2,
                                (1000 + (d * 13 + i * 7) % 60000
                                 - 30000) * mag,
                                None if (i + d) % 3 == 0
                                else f"n{(d + i) % 5}",
                            ],
                        )
                    )
                ids.append(d)
                payloads.append(sq.build_db("docs", rows))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def sqlite_decode(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> table summary through the OWN b-tree
    walk: page/row counts, rowid bounds, integer-column sum, labels
    in rowid order, NULL count. One Arrow map stage, no shuffle."""
    import pandas as pd

    from ..functions import minisqlite as sq

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = sq.read_db(bytes(blob))
                recs = m["rows"]
                rows.append(
                    (
                        int(d),
                        int(m["n_pages"]),
                        len(recs),
                        int(recs[-1][0]),
                        sum(v[3] for _, v in recs),
                        ";".join(v[1] for _, v in recs),
                        sum(1 for _, v in recs if v[4] is None),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_pages", "n_rows", "max_rowid",
                    "sum_val", "labels", "n_nulls",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, n_pages int, n_rows int, max_rowid long, "
            "sum_val long, labels string, n_nulls int"
        ),
    )


# ---------------------------------------------------------------------------
# PDF 1.5 compressed cross-references (ISO 32000-1 §7.5.7/7.5.8) —
# modern web PDFs; the classic-xref walk (minipdf, the reference's
# fixture shape) cannot open these.
# ---------------------------------------------------------------------------


def synth_pdf15_blobs(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — a 2-page PDF 1.5 per doc through the OWN
    builder (functions/minipdf15): Flate content streams, catalog/
    page tree packed in an object stream, Up-predicted XRef
    stream."""
    import pandas as pd

    from ..functions import minipdf15

    def batches(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                pages = [
                    [
                        [f"n{d % 7}", f"a{d % 5}"],
                        [f"g{d % 3}", f"t{d % 9}"],
                    ],
                    [[f"z{d % 4}", f"w{d % 11}"]],
                ]
                ids.append(d)
                payloads.append(minipdf15.write_pdf15(pages))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def pdf15_extract(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> per-page cell text through the 1.5
    structural walk (XRef stream + predictor + ObjStm). One Arrow
    map stage, no shuffle."""
    import pandas as pd

    from ..functions import minipdf15

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                pages = minipdf15.extract_text_rows(bytes(blob))
                texts = [
                    "|".join(
                        cell for row in page for _, cell in row
                    )
                    for page in pages
                ]
                rows.append(
                    (int(d), len(pages), texts[0], texts[1])
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_pages", "p1_text", "p2_text"],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, n_pages int, p1_text string, p2_text string"
        ),
    )


# ---------------------------------------------------------------------------
# Git packfile ingest (gitformat-pack) — code corpora arrive as
# crawled git repositories; the packfile is the storage unit.
# ---------------------------------------------------------------------------


def synth_git_packs(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — a 3-object pack per doc: two base blobs
    and an OFS_DELTA (copy/insert/copy against blob 0) whose
    negative offset crosses the second blob, so the +1-per-step
    offset rule is live on every doc."""
    import pandas as pd

    from ..functions import minigitpack as gp

    def batches(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                base = (f"base-{d}-" * 4).encode()
                ins = f"INS{d % 10}".encode()
                delta = gp.make_delta(
                    base,
                    base[:5] + ins + base[5:],
                    [
                        ("copy", 0, 5),
                        ("insert", ins),
                        ("copy", 5, len(base) - 5),
                    ],
                )
                pack = gp.build_pack(
                    [
                        (gp.OBJ_BLOB, base, None),
                        (gp.OBJ_BLOB, f"other{d % 5}".encode(), None),
                        (gp.OBJ_BLOB, delta, 0),
                    ]
                )
                ids.append(d)
                payloads.append(pack)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def git_pack_decode(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> object inventory with the delta chain
    RESOLVED (trailer SHA-1 verified during the walk). One Arrow
    map stage, no shuffle."""
    import pandas as pd

    from ..functions import minigitpack as gp

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = gp.read_pack(bytes(blob))
                objs = m["objects"]
                deltas = [o for o in objs if o["from_delta"]]
                rows.append(
                    (
                        int(d),
                        int(m["n_objects"]),
                        int(objs[0]["size"]),
                        int(deltas[0]["size"]),
                        len(deltas),
                        deltas[0]["data"].decode(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_objects", "base_len", "target_len",
                    "n_deltas", "resolved",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, n_objects int, base_len int, "
            "target_len int, n_deltas int, resolved string"
        ),
    )


# ---------------------------------------------------------------------------
# Bencode / torrent metainfo (BEP 3) — .torrent sidecars in a web
# corpus; webseed URLs feed the frontier.
# ---------------------------------------------------------------------------


def synth_torrents(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — a metainfo dict per doc through the OWN
    canonical encoder (byte-sorted keys)."""
    import pandas as pd

    from ..functions import minibencode

    def batches(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                meta = {
                    "announce": f"https://t{d % 5}.example.org/announce",
                    "info": {
                        "length": 1 << (10 + d % 16),
                        "name": f"file-{d}.bin",
                        "piece length": 16384,
                    },
                    "url-list": [
                        f"https://seed{i}.example.org/f/{d}"
                        for i in range(1 + d % 3)
                    ],
                }
                ids.append(d)
                payloads.append(minibencode.encode(meta))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def torrent_decode(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> metainfo fields through the walk (key
    ordering verified). One Arrow map stage."""
    import pandas as pd

    from ..functions import minibencode

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = minibencode.decode(bytes(blob))
                rows.append(
                    (
                        int(d),
                        m["announce"].decode(),
                        m["info"]["name"].decode(),
                        int(m["info"]["length"]),
                        int(m["info"]["piece length"]),
                        len(m["url-list"]),
                        ";".join(u.decode() for u in m["url-list"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "announce", "name", "length",
                    "piece_len", "n_seeds", "webseeds",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, announce string, name string, length bigint, "
            "piece_len int, n_seeds int, webseeds string"
        ),
    )


# ---------------------------------------------------------------------------
# MessagePack sidecars — crawl-metadata records (minimsgpack walk)
# ---------------------------------------------------------------------------


def synth_msgpack_sidecars(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — one crawl-metadata record per doc through
    the OWN canonical encoder, with every integer family live by
    construction: positive/negative fixints (status nibble,
    tz_offset), uint64 (content_hash), int8/16 (negative offsets),
    str/bin/array/map/nil/bool."""
    import pandas as pd

    from ..functions import minimsgpack as mp

    def batches(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rec = {
                    "url": f"https://h{d % 50}.example.org/p/{d}",
                    "status": 200 if d % 10 else 404,
                    "tz_offset": -((d % 12) * 3600),
                    "content_hash": (d * 2654435761) % (1 << 63),
                    "redirects": [
                        f"https://h{d % 50}.example.org/r/{i}"
                        for i in range(d % 3)
                    ],
                    "etag": None if d % 4 == 0 else f'W/"{d:x}"',
                    "digest": bytes.fromhex(f"{(d * 2654435761) % (1 << 32):08x}"),
                    "flags": {"nofollow": d % 5 == 0, "depth": d % 7},
                }
                ids.append(d)
                payloads.append(mp.encode(rec))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def msgpack_decode(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> record fields through the walk (family
    tags, sign-extension contract, duplicate-key rejection). One
    Arrow map stage, no shuffle."""
    import pandas as pd

    from ..functions import minimsgpack as mp

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = mp.decode(bytes(blob))
                rows.append(
                    (
                        int(d),
                        m["url"],
                        int(m["status"]),
                        int(m["tz_offset"]),
                        int(m["content_hash"]),
                        len(m["redirects"]),
                        m["etag"] is not None,
                        m["digest"].hex(),
                        bool(m["flags"]["nofollow"]),
                        int(m["flags"]["depth"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "url", "status", "tz_offset",
                    "content_hash", "n_redirects", "etag_present",
                    "digest_hex", "nofollow", "depth",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, url string, status int, tz_offset int, "
            "content_hash bigint, n_redirects int, etag_present boolean, "
            "digest_hex string, nofollow boolean, depth int"
        ),
    )


# ---------------------------------------------------------------------------
# LevelDB/RocksDB block-based SSTable — URL-seen state files
# ---------------------------------------------------------------------------


def synth_sst_files(docs: "DataFrame", mod: int = 5) -> "DataFrame":
    """(doc_id, payload) — one SSTable per selected doc holding that
    doc's synthetic URL-seen slice: keys 'url-<doc_id>-<i>' (strictly
    ascending byte order via zero-padded i), values the fetch status.
    Multi-block by construction (block_entries=8 over 20+ keys) so
    the index walk, restart points and the snappy'd-every-other-block
    arm are all live per file."""
    import pandas as pd

    from ..functions import minisst

    def batches(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 20 + d % 13
                pairs = [
                    (
                        f"url-{d}-{i:04d}".encode(),
                        f"status={200 if (d + i) % 9 else 404}".encode(),
                    )
                    for i in range(n)
                ]
                ids.append(d)
                payloads.append(minisst.build_sst(pairs))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def sst_walk(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> table stats through the walk: every block
    crc32c-verified (masked), prefix compression undone via restart
    points, key order checked within and across blocks. One Arrow
    map stage, no shuffle."""
    import pandas as pd

    from ..functions import minisst

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = minisst.parse_sst(bytes(blob))
                n404 = sum(
                    1 for _, v in m["pairs"] if v == b"status=404"
                )
                rows.append(
                    (
                        int(d),
                        len(m["pairs"]),
                        m["n_blocks"],
                        m["n_compressed"],
                        m["n_restarts"],
                        n404,
                        m["pairs"][0][0].decode(),
                        m["pairs"][-1][0].decode(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_keys", "n_blocks", "n_compressed",
                    "n_restarts", "n_404", "first_key", "last_key",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, n_keys int, n_blocks int, n_compressed int, "
            "n_restarts int, n_404 int, first_key string, last_key string"
        ),
    )


# ---------------------------------------------------------------------------
# Arrow IPC streams — the engine's own interchange format, decoded
# from first principles (miniarrowipc: flatbuffers vtable walk)
# ---------------------------------------------------------------------------


def synth_arrow_streams(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — one Arrow IPC stream per doc written by
    PYARROW (the reference producer; the decoder never touches it):
    4 columns (int64, nullable float64, nullable utf8, bool) with
    planted nulls, split into TWO record batches on odd docs."""
    import io

    import pandas as pd

    def batches(it):
        import pyarrow as pa

        def one(d: int) -> bytes:
            n = 5 + d % 7
            ids = [d * 100 + i for i in range(n)]
            scores = [
                None if (d + i) % 5 == 0
                else ((d * 31 + i * 7) % 1000) / 8.0
                for i in range(n)
            ]
            tags = [
                None if (d + i) % 4 == 0 else f"t{(d + i) % 10}"
                for i in range(n)
            ]
            flags = [(d + i) % 3 == 0 for i in range(n)]
            t = pa.table({
                "id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
                "tag": pa.array(tags, pa.utf8()),
                "flag": pa.array(flags, pa.bool_()),
            })
            sink = io.BytesIO()
            with pa.ipc.new_stream(sink, t.schema) as w:
                if d % 2:
                    w.write_table(t.slice(0, n // 2))
                    w.write_table(t.slice(n // 2))
                else:
                    w.write_table(t)
            return sink.getvalue()

        for pdf in it:
            ids = [int(x) for x in pdf["doc_id"]]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [one(d) for d in ids]}
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def arrow_ipc_walk(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> stream stats through the OWN walk
    (flatbuffers vtables, union ordinals, struct vectors, validity
    bitmaps, utf8 offset arrays). One Arrow map stage, no shuffle —
    and no pyarrow IPC reader anywhere in the path."""
    import pandas as pd

    from ..functions import miniarrowipc as ai

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = ai.read_stream(bytes(blob))
                cols = {f["name"]: [] for f in m["fields"]}
                for b in m["batches"]:
                    for k, v in b["columns"].items():
                        cols[k].extend(v)
                rows.append((
                    int(d),
                    m["n_messages"],
                    len(m["batches"]),
                    sum(b["n_rows"] for b in m["batches"]),
                    len(m["fields"]),
                    sum(cols["id"]),
                    round(sum(v for v in cols["score"]
                              if v is not None), 4),
                    sum(1 for v in cols["score"] if v is None),
                    sum(1 for v in cols["tag"] if v is None),
                    ";".join(v for v in cols["tag"] if v is not None),
                    sum(1 for v in cols["flag"] if v),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_messages", "n_batches", "n_rows",
                    "n_fields", "id_sum", "score_sum", "score_nulls",
                    "tag_nulls", "tags", "n_true",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, n_messages int, n_batches int, n_rows int, "
            "n_fields int, id_sum bigint, score_sum double, "
            "score_nulls int, tag_nulls int, tags string, n_true int"
        ),
    )


# ---------------------------------------------------------------------------
# Parquet data-page walk — below the footer (miniparquet pages)
# ---------------------------------------------------------------------------


def synth_parquet_files(docs: "DataFrame", mod: int = 3) -> "DataFrame":
    """(doc_id, payload) — one parquet file per selected doc written
    by PYARROW (compression NONE, dictionary off, v1 data pages —
    the scope the walk declares): the same planted columns as the
    Arrow IPC gate so the two container walks cross-check."""
    import io

    import pandas as pd

    def batches(it):
        import pyarrow as pa
        import pyarrow.parquet as pq

        def one(d: int) -> bytes:
            n = 5 + d % 7
            t = pa.table({
                "id": pa.array(
                    [d * 100 + i for i in range(n)], pa.int64()
                ),
                "score": pa.array(
                    [None if (d + i) % 5 == 0
                     else ((d * 31 + i * 7) % 1000) / 8.0
                     for i in range(n)], pa.float64()),
                "tag": pa.array(
                    [None if (d + i) % 4 == 0 else f"t{(d + i) % 10}"
                     for i in range(n)], pa.utf8()),
            })
            sink = io.BytesIO()
            pq.write_table(
                t, sink, compression="NONE", use_dictionary=False,
                data_page_version="1.0",
            )
            return sink.getvalue()

        for pdf in it:
            ids = [int(x) for x in pdf["doc_id"]]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [one(d) for d in ids]}
            )

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def parquet_page_walk(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> column values through the OWN page walk
    (thrift-compact PageHeaders, RLE/bit-packed definition levels,
    PLAIN values) — no pyarrow reader in the path. One Arrow map
    stage, no shuffle."""
    import pandas as pd

    from ..functions import miniparquet as mp

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                cols = mp.read_table_values(bytes(blob))
                rows.append((
                    int(d),
                    cols["_num_rows"],
                    sum(v for v in cols["id"] if v is not None),
                    round(sum(v for v in cols["score"]
                              if v is not None), 4),
                    sum(1 for v in cols["score"] if v is None),
                    sum(1 for v in cols["tag"] if v is None),
                    ";".join(v for v in cols["tag"] if v is not None),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_rows", "id_sum", "score_sum",
                    "score_nulls", "tag_nulls", "tags",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, n_rows bigint, id_sum bigint, "
            "score_sum double, score_nulls int, tag_nulls int, "
            "tags string"
        ),
    )


# ---------------------------------------------------------------------------
# Avro schema evolution — reader/writer resolution (miniavro)
# ---------------------------------------------------------------------------

_AVRO_V1 = {
    "type": "record", "name": "fetch_v1",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "status", "type": "int"},
        {"name": "note", "type": "string"},
        {"name": "legacy", "type": "string"},
        {"name": "elapsed", "type": "int"},
    ],
}

_AVRO_V2 = {
    "type": "record", "name": "fetch_v2",
    "fields": [
        {"name": "id", "type": "long"},                      # int->long
        {"name": "http_status", "type": "int",
         "aliases": ["status"]},                             # alias match
        {"name": "note", "type": "bytes"},                   # string->bytes
        {"name": "elapsed", "type": "double"},               # int->double
        {"name": "fetch_ms", "type": "double",
         "default": 0.0},                                    # reader-only
        # writer's 'legacy' has no reader field: skipped
    ],
}


def synth_avro_v1_files(docs: "DataFrame", mod: int = 3) -> "DataFrame":
    """(doc_id, payload) — one OCF per selected doc under the V1
    writer schema, via the OWN container writer."""
    import pandas as pd

    from ..functions import miniavro

    def batches(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                recs = [
                    {
                        "id": d * 10 + i,
                        "status": 404 if (d + i) % 10 == 0 else 200,
                        "note": f"n{d}-{i}",
                        "legacy": "x",
                        "elapsed": (d + i) % 500,
                    }
                    for i in range(3 + d % 4)
                ]
                ids.append(d)
                payloads.append(
                    miniavro.write_ocf(recs, _AVRO_V1, sync=b"\x07" * 16)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def avro_evolved_read(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> V1 files read UNDER THE V2 READER SCHEMA
    through the spec's resolution rules: int->long and int->double
    promotions, alias matching (status -> http_status), string->
    bytes, a defaulted reader-only field, and a skipped writer-only
    field — all live per doc. One Arrow map stage."""
    import pandas as pd

    from ..functions import miniavro

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                _, recs = miniavro.read_ocf_resolved(
                    bytes(blob), _AVRO_V2
                )
                rows.append((
                    int(d),
                    len(recs),
                    sum(r["id"] for r in recs),
                    sum(1 for r in recs if r["http_status"] == 404),
                    ";".join(r["note"].decode() for r in recs),
                    float(sum(r["elapsed"] for r in recs)),
                    float(sum(r["fetch_ms"] for r in recs)),
                    all(isinstance(r["id"], int)
                        and isinstance(r["elapsed"], float)
                        and isinstance(r["note"], bytes)
                        and "legacy" not in r for r in recs),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_records", "id_sum", "n_404", "notes",
                    "elapsed_sum", "fetch_ms_sum", "resolved_ok",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, n_records int, id_sum bigint, n_404 int, "
            "notes string, elapsed_sum double, fetch_ms_sum double, "
            "resolved_ok boolean"
        ),
    )
