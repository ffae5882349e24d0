"""Extraction operator — vectorized parse over fetched pages.

The reference's 47 per-spider ``parse`` callbacks (row-at-a-time
Python over Twisted) become ONE ``mapInPandas`` pass over Arrow
batches of ``(url, source, parse_family, depth, meta, html)``,
dispatched to parse-family extractors (SURVEY.md §2.10). A single
pass parses each body once and emits a union stream of records and
links, split afterwards by a cheap filter — bodies are the expensive
part, not the rows.

Item normalization (reference pipelines.py:20-40) runs in the same
batch via :func:`normalize_items_pdf` so field bytes leaving this
operator are final.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.textnorm import normalize_items_pdf
from ..schema import FEED_EXPORT_FIELDS
from ..sources.families import FAMILIES

# union output of one extract pass
EXTRACT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'rec' | 'link'
        T.StructField("url", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("item_index", T.IntegerType(), True),
    ]
    + [T.StructField(f, T.StringType(), True) for f in FEED_EXPORT_FIELDS]
    + [
        T.StructField("link_url", T.StringType(), True),
        T.StructField("link_family", T.StringType(), True),
        T.StructField("link_depth", T.IntegerType(), True),
        T.StructField("link_meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_REC_COLS = ["kind", "url", "source", "item_index", *FEED_EXPORT_FIELDS]
_LINK_COLS = ["kind", "url", "source", "link_url", "link_family", "link_depth", "link_meta"]
_ALL_COLS = [f.name for f in EXTRACT_OUT_SCHEMA.fields]


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        outs = []
        for family, grp in pdf.groupby("parse_family", sort=False):
            fam = FAMILIES[family]
            recs, links = fam.extract_batch(grp)
            if recs:
                rdf = pd.DataFrame(recs)
                for col in FEED_EXPORT_FIELDS:
                    if col not in rdf:
                        rdf[col] = None
                rdf = normalize_items_pdf(rdf)
                rdf["kind"] = "rec"
                outs.append(rdf.reindex(columns=_ALL_COLS))
            if links:
                ldf = pd.DataFrame(links).rename(
                    columns={
                        "url": "link_url",
                        "parse_family": "link_family",
                        "depth": "link_depth",
                        "meta": "link_meta",
                    }
                )
                # lineage: the emitting page's url (families stamp it)
                ldf["url"] = ldf.pop("from_url")
                ldf["kind"] = "link"
                outs.append(ldf.reindex(columns=_ALL_COLS))
        if outs:
            combined = pd.concat(outs, ignore_index=True).astype(object)
            # Arrow needs None (not NaN) for absent struct/map/int cells
            combined[combined.isna()] = None
            yield combined


def run_extract(fetched: DataFrame) -> DataFrame:
    """fetched: frontier columns + html. Pages are keyed by canonical
    url, so extraction sees canonical_url as the page identity (and
    goldens are keyed by it). Returns the union extract stream (cache
    before splitting)."""
    cols = [
        F.col("canonical_url").alias("url"),
        "source",
        "parse_family",
        "depth",
        "meta",
        "html",
    ]
    return fetched.select(*cols).mapInPandas(
        _extract_batches, schema=EXTRACT_OUT_SCHEMA
    )


def split_records_links(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    records = extracted.filter(F.col("kind") == "rec").select(
        "url", "source", "item_index", *FEED_EXPORT_FIELDS
    )
    links = (
        extracted.filter(F.col("kind") == "link")
        .select(
            F.col("link_url").alias("url"),
            "source",
            F.col("link_family").alias("parse_family"),
            F.col("link_depth").alias("depth"),
            F.col("link_meta").alias("meta"),
        )
    )
    return records, links
