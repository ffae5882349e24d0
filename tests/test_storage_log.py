"""Transaction-log replay + z-order layout (operators/storage.py).

Pins: last-writer-wins carries the WINNING action's attributes, the
checkpoint-cut invariant (replay(checkpoint ∪ tail) == replay(full)
— Delta's _last_checkpoint contract), Morton-interleave correctness,
and the pruning payoff z-order exists for (fewer files touched than a
linear single-column layout for a 2-D rectangle query).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators.storage import (
    delta_checkpoint,
    delta_log_replay,
    zorder_file_stats,
)


def _actions(spark):
    rows = [
        # (version, action, path, part, size_bytes)
        (0, "add", "a", 0, 100),          # plain live
        (0, "add", "b", 0, 10),
        (3, "remove", "b", 0, 0),         # dead
        (1, "add", "c", 1, 50),
        (4, "remove", "c", 1, 0),
        (7, "add", "c", 1, 57),           # re-added, NEW size wins
        (2, "add", "d", 1, 20),
    ]
    return spark.createDataFrame(
        rows, "version long, action string, path string, part long, size_bytes long"
    )


def test_last_writer_wins_with_attributes(spark):
    got = {
        r["part"]: (r["n_files"], r["total_bytes"], r["max_add_version"])
        for r in delta_log_replay(_actions(spark)).collect()
    }
    # part 0: only 'a' lives; part 1: 'c' (re-added at 57!) and 'd'
    assert got == {0: (1, 100, 0), 1: (2, 77, 7)}


def test_checkpoint_cut_equals_full_replay(spark):
    full = _actions(spark)
    for v in (0, 2, 4, 7):
        ckpt = delta_checkpoint(full, v)
        tail = full.filter(F.col("version") > v)
        got = sorted(map(tuple, delta_log_replay(ckpt.unionByName(tail)).collect()))
        want = sorted(map(tuple, delta_log_replay(full).collect()))
        assert got == want, f"checkpoint cut at v={v} diverged"


def test_checkpoint_is_pure_adds_of_live_set(spark):
    ckpt = delta_checkpoint(_actions(spark), 4).collect()
    assert all(r["action"] == "add" for r in ckpt)
    # at v=4: a live(100), b removed, c removed, d live(20)
    assert {(r["path"], r["size_bytes"]) for r in ckpt} == {("a", 100), ("d", 20)}


def _grid(spark, n=256):
    # one point per (x, y) cell of a 16x16-coarse grid scaled up:
    # uniform coverage so zone maps are tight
    return spark.range(n * 4).select(
        (F.col("id") % 256).cast("long").alias("x"),
        ((F.col("id") * 37) % 256).cast("long").alias("y"),
    )


def test_morton_interleave_groups_quadrants(spark):
    # rows in the same z-order file must be spatially local: with
    # 64-row files over 1024 uniform points, every file's bounding
    # box is far smaller than the full 256x256 space
    stats = zorder_file_stats(_grid(spark), "x", "y", file_rows=64).collect()
    assert len(stats) == 16
    for r in stats:
        area = (r["max_x"] - r["min_x"] + 1) * (r["max_y"] - r["min_y"] + 1)
        assert area <= 256 * 256 // 4, (r["file_id"], area)


def test_zorder_prunes_better_than_linear(spark):
    from pyspark.sql import Window

    pts = _grid(spark)
    z_stats = zorder_file_stats(pts, "x", "y", file_rows=64)
    z_touched = z_stats.filter("touched").count()

    # linear layout: same file size, ordered by x only — y zone maps
    # are useless, so the x-slab's files are all touched
    w = Window.orderBy("x", "y")
    lin = (
        pts.withColumn(
            "file_id", ((F.row_number().over(w) - 1) / 64).cast("long")
        )
        .groupBy("file_id")
        .agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .filter(
            (F.col("min_x") <= 127)
            & (F.col("max_x") >= 64)
            & (F.col("min_y") <= 63)
            & (F.col("max_y") >= 0)
        )
    )
    lin_touched = lin.count()
    assert 0 < z_touched < lin_touched, (z_touched, lin_touched)
