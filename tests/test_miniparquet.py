"""miniparquet: the Thrift compact-protocol footer walk is tested
against REAL producers (pyarrow/parquet-cpp written files across
codecs, row-group sizes, nulls and nested lists) with DuckDB's
parquet_metadata() as the independent cross-engine oracle."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from goto_eater_crawler_spark.functions import miniparquet as mp

SF = "/root/testdata/sf0.001"


def _cross_check(path: str):
    footer = mp.read_footer_from_file(path)
    con = duckdb.connect()
    dd = con.execute(
        "SELECT path_in_schema, type, num_values, total_compressed_size, "
        "total_uncompressed_size, compression, stats_null_count "
        f"FROM parquet_metadata('{path}') ORDER BY row_group_id, column_id"
    ).fetchall()
    mine = [
        (c["path"], c["type"], c["num_values"],
         c["total_compressed_size"], c["total_uncompressed_size"],
         c["codec"], c["null_count"])
        for rg in footer["row_groups"] for c in rg["columns"]
    ]
    assert len(mine) == len(dd)
    for m, d in zip(mine, dd):
        # duckdb renders nested paths "a, list, element"; ours "a.list.element"
        assert m[0] == d[0].replace(", ", "."), (m, d)
        assert m[1:6] == tuple(d[1:6]), (m, d)
        assert m[6] == d[6], (m, d)
    nrows = con.execute(
        f"SELECT num_rows FROM parquet_file_metadata('{path}')"
    ).fetchone()[0]
    assert footer["num_rows"] == nrows
    return footer


@pytest.mark.parametrize(
    "table", ["documents", "events", "orders", "lineitem", "embeddings"]
)
def test_testdata_footers_match_duckdb(table):
    footer = _cross_check(f"{SF}/{table}.parquet")
    assert footer["row_groups"]
    assert footer["created_by"].startswith("parquet-cpp")


@pytest.mark.parametrize("codec", ["snappy", "zstd", "gzip", "none"])
def test_codecs_and_multi_row_groups(tmp_path, codec):
    t = pa.table(
        {
            "k": pa.array(range(10_000), pa.int64()),
            "v": pa.array([i * 0.5 for i in range(10_000)], pa.float64()),
            "s": pa.array([f"s{i % 97}" for i in range(10_000)]),
        }
    )
    path = str(tmp_path / f"t_{codec}.parquet")
    pq.write_table(t, path, compression=codec, row_group_size=3000)
    footer = _cross_check(path)
    assert len(footer["row_groups"]) == 4  # 3000*3 + 1000
    # aggregated stats across row groups must equal the data range
    ks = [c for rg in footer["row_groups"] for c in rg["columns"]
          if c["path"] == "k"]
    assert min(c["min"] for c in ks) == 0
    assert max(c["max"] for c in ks) == 9_999


def test_nulls_and_stats_decode(tmp_path):
    t = pa.table(
        {
            "x": pa.array([1, None, 3, None, 5], pa.int32()),
            "d": pa.array([None, -2.5, 0.0, 7.25, None], pa.float64()),
            "b": pa.array(["aa", None, "zz", "mm", None]),
        }
    )
    path = str(tmp_path / "nulls.parquet")
    pq.write_table(t, path)
    footer = _cross_check(path)
    cols = {c["path"]: c for c in footer["row_groups"][0]["columns"]}
    assert cols["x"]["null_count"] == 2
    assert (cols["x"]["min"], cols["x"]["max"]) == (1, 5)
    assert (cols["d"]["min"], cols["d"]["max"]) == (-2.5, 7.25)
    assert (cols["b"]["min"], cols["b"]["max"]) == (b"aa", b"zz")


def test_long_form_field_ids_via_generic_walker(tmp_path):
    # key_value_metadata exercises strings/lists beyond the stats
    # path; schema with 20+ columns exercises field-id deltas
    t = pa.table({f"c{i:02d}": pa.array([i], pa.int64()) for i in range(24)})
    path = str(tmp_path / "wide.parquet")
    pq.write_table(t, path)
    footer = _cross_check(path)
    assert len(footer["columns"]) == 24


def test_tail_only_read(tmp_path):
    t = pa.table({"k": pa.array(range(100_000), pa.int64())})
    path = str(tmp_path / "big.parquet")
    pq.write_table(t, path)
    # a 4 KB tail is far smaller than the file but covers the footer
    footer = mp.read_footer_from_file(path, tail_bytes=4096)
    assert footer["num_rows"] == 100_000


def test_rejects_non_parquet():
    with pytest.raises(mp.ParquetError):
        mp.read_footer(b"PK\x03\x04 not parquet PAR0")
