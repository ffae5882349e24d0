"""The crawl driver loop — batch fetch rounds with atomic checkpoints.

Execution model (SURVEY.md §4.2): the reference's continuous polite
crawl (Scrapy event loop, 4-5 h nightly) becomes a driver-side loop of
batch rounds; each round is one Spark job DAG:

    frontier_r
      -> robots filter                     (P4/T2)
      -> per-host quota window             (A6/W1, salted)
      -> fetch join vs pages               (J1)
      -> mapInPandas extract               (records ∪ links)
      -> link canonicalize + intra-round dedup (P6/A4)
      -> bloom-accelerated seen anti-join  (P7/U2)
      -> commit round atomically           (T6)

Determinism contract (shared with the test oracle): within a round,
hosts fetch their URLs in (priority desc, depth asc, canonical_url
asc) order; global crawl order ``fetch_seq`` enumerates fetched URLs
by (round, host, rank_in_host). The seen set is keyed by canonical
URL; a URL is "seen" from the moment it is scheduled (Scrapy
dupefilter semantics — fingerprints are recorded at enqueue time).

Retries: fetch misses re-enqueue with ``retry_count + 1`` and decayed
priority until ``max_retries`` (reference: RETRY_TIMES = 8
settings.py:119, exponential backoff + jitter middlewares.py:109-130 —
wall-clock backoff has no meaning against a static pages table, so the
backoff becomes deterministic priority decay with hash-derived jitter,
no random()), then dead-letter.

Checkpointing (T6): with ``checkpoint_dir`` set, every round writes
frontier / seen-delta / bloom blocks / records / fetch_log as parquet
under ``rounds/round=NNNN/`` and commits by writing ``manifest.json``
LAST — the manifest is the atomic commit mark; a crashed round leaves
no manifest and is invisible to resume. ``CrawlEngine.resume`` picks
up from the greatest committed round with identical state.

On a real cluster the same loop runs unchanged via
``spark-submit --py-files engine.zip``; round state flows through the
pluggable :mod:`~goto_eater_crawler_spark.plans.store` TableStore —
``checkpoint_dir=None`` (memory), a path (parquet + manifest-last),
or ``iceberg:<catalog.db.prefix>`` (Iceberg tables, commit = manifest
append; jars absent in this sandbox so only construction is gated).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from concurrent.futures import ThreadPoolExecutor

from ..functions.urltools import host_col, with_url_identity
from ..operators import cuckoo as _cuckoo
from ..operators.dedup import BloomParams, build_blocks, split_new_urls, update_blocks
from ..operators.extract import run_extract, split_pages, split_records_links
from ..operators.fetch import fetch_join
from ..operators.politeness import (
    domains_dim,
    offsite_split,
    priority_col,
    quota_split,
    robots_split,
    with_crawl_delay,
)
from ..schema import (
    BLOOM_BLOCK_SCHEMA,
    FEED_EXPORT_FIELDS,
    FETCH_LOG_SCHEMA,
    FRONTIER_SCHEMA,
)
from .store import make_store

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]
LOG_COLS = [f.name for f in FETCH_LOG_SCHEMA.fields]

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
    ]
)


@dataclass
class CrawlConfig:
    round_budget: float = 60.0  # seconds of per-host politeness budget
    max_rounds: int = 64
    max_retries: int = 8  # reference settings.py:119
    bloom: BloomParams | None = field(default_factory=BloomParams)
    # which probabilistic seen-filter arm fronts the exact table:
    # "bloom" (default; cfg.bloom == None disables filtering entirely)
    # or "cuckoo" (deletable fingerprints — frontier retraction). The
    # exact-semantics contract is identical either way.
    seen_filter: str = "bloom"
    cuckoo: _cuckoo.CuckooParams | None = None
    fetch_strategy: str = "auto"
    checkpoint_dir: str | None = None
    assign_fetch_seq: bool = True
    quota_salts: int = 8
    # source -> allowed_domains (P4 offsite scope; Scrapy's
    # OffsiteMiddleware). None disables the filter.
    allowed_domains: dict[str, tuple[str, ...]] | None = None
    # optional (host, rank) DataFrame (operators/hostrank.host_rank):
    # when set, frontier priority = rank x W - depth (north_rule O3)
    # instead of the flat default. Pinned once at engine construction.
    host_ranks: object | None = None  # DataFrame; object avoids import cycle
    # global per-round fetch capacity across ALL hosts — the
    # reference's CONCURRENT_REQUESTS global cap (settings.py:24, T7)
    # in round form. With host_ranks set, this is where rank drives
    # CROSS-host scheduling: the global cut is a top-K by priority.
    round_capacity: int | None = None
    # per-round hot-host detection via the Misra-Gries sketch
    # (operators/sketches.heavy_hitters — VERDICT r3 ask #8): when
    # set, each round's metrics carry ``hot_hosts`` = the top-k
    # (host, lower-bound count) pairs over that round's fetched rows
    # plus the sketch's global error bound. Bounded memory at any
    # frontier size (capacity counters per partition, only
    # O(partitions x capacity) summary rows shuffle) and EXACT —
    # max_err 0 — whenever a round touches fewer distinct hosts than
    # hot_hosts_capacity, which keeps resume/metric parity at test
    # scale while staying safe at 10^10. None = off (default).
    hot_hosts_k: int | None = None
    hot_hosts_capacity: int = 4096
    # join strategy hint for the EXACT-CONFIRM joins against the seen
    # table (fp-confirm anti-join in the seen split). "auto" lets AQE
    # pick — right for small/fixture crawls where seen broadcasts
    # cheaply. At steady scale the seen table is the biggest relation
    # in the round (10^10 rows in production; 2M at the 4x bench) and
    # AQE's broadcast choice builds a single-task hash relation — a
    # measured 25 s SERIAL stage per round at the 4x web. The scale
    # bench pins "shuffle_hash": both sides shuffle-partition on the
    # key and build per-partition tables in parallel (round-4
    # profiling, BASELINE.md).
    seen_confirm_join: str = "auto"
    # shard count for the IMMUTABLE xor-filter seen-snapshot tier
    # (operators/xorfilter; Graf & Lemire 2020) built by
    # CrawlEngine.freeze_seen_snapshot: the frozen historical seen
    # mass at ~10 bits/key, probed per round ahead of the mutable
    # bloom/cuckoo arm (which after a freeze covers only post-freeze
    # deltas). At 10^10 keys, shards scale the per-blob size and the
    # build parallelism; the per-shard blobs broadcast to the probe.
    xor_snapshot_shards: int = 8
    # optional recrawl/scheduling policy arm (VERDICT r4 ask #7 —
    # operators/recrawl): None (static priority) | "ucb" | "ses" |
    # "cusum". When set, each round folds a per-host novelty-yield
    # indicator into a slim policy state (checkpointed through the
    # store like every round artifact — resume-safe) and the NEXT
    # round's link priorities become
    #   priority = base(host_rank, depth) + recrawl_weight * boost
    # where boost is the UCB1 score / SES level / CUSUM alarm count
    # of the link's host. Hosts with no state yet get
    # recrawl_unseen_boost (UCB's play-every-arm-once rule).
    recrawl_policy: str | None = None
    recrawl_weight: float = 10.0
    recrawl_unseen_boost: float = 4.0
    # incremental seen-set cardinality estimate via HyperLogLog
    # (operators/sketches — VERDICT r3 ask #8): when set (register
    # count log2), the loop carries <= 2^log2m register rows as state,
    # folds each round's seen delta in by groupBy-max (associative +
    # idempotent, the retry-safety class of the bloom OR), and stamps
    # ``seen_distinct_est`` into the round metrics — the 10^10-scale
    # cardinality counter that never rescans the seen set. None = off.
    seen_hll_log2m: int | None = None


@dataclass
class CrawlResult:
    records: DataFrame
    fetch_log: DataFrame
    seen: DataFrame
    metrics: list[dict]
    # final seen-filter blocks (bloom/cuckoo arm; None when filtering
    # is off) — what a continuation (retract + run_rounds) resumes from
    blocks: DataFrame | None = None


def _valid_url() -> F.Column:
    """Only http(s) URLs with a parseable host enter the frontier —
    the analogue of Scrapy's download-handler scheme set + offsite
    middleware. Null canonical URLs must never reach the frontier:
    null join keys silently fall out of the anti-join dedup paths.
    """
    return (
        F.col("canonical_url").isNotNull()
        & F.col("host").isNotNull()
        & (F.col("host") != "")
        & (
            F.col("canonical_url").startswith("http://")
            | F.col("canonical_url").startswith("https://")
        )
    )


def assign_fetch_seq(
    fetched_pages: DataFrame, round_no: int, fetch_seq_offset: int
) -> DataFrame:
    """Global crawl-order sequence (W3) over a round's fetched pages —
    scalable: NO partition-less window anywhere.

    (1) rank within host via a PARTITIONED window,
    (2) per-host offsets via a cumsum over the per-host COUNTS
        relation (one row per host — orders of magnitude smaller than
        the fetch log; the only single-task step sees #hosts rows,
        never #urls),
    (3) join the offsets back (AQE broadcasts when small).
    Total order produced = (host asc, rank_in_host asc) — identical to
    a global window, without funnelling the round's log through one
    task. Plan-shape pinned by tests/test_crawl_e2e.py.
    """
    host_w = Window.partitionBy("host").orderBy("rank_in_host")
    ranked = fetched_pages.withColumn("_rn", F.row_number().over(host_w))
    off_w = (
        # the offsets relation is one row per HOST, not per URL —
        # lit(0) partitioning states the bound in the plan
        Window.partitionBy(F.lit(0))
        .orderBy("host")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranked.groupBy("host")
        .agg(F.count("*").alias("_n"))
        .select(
            "host",
            F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off"),
        )
    )
    return ranked.join(offsets, "host").select(
        F.lit(round_no).alias("round"),
        (
            (F.col("_rn") + F.col("_off")).cast("long") + F.lit(fetch_seq_offset)
        ).alias("fetch_seq"),
        "url",
        "canonical_url",
        "url_hash",
        "host",
        "depth",
        F.lit("fetched").alias("status"),
    )


def _log_rows(df: DataFrame, round_no: int, status: str) -> DataFrame:
    return df.select(
        F.lit(round_no).alias("round"),
        F.lit(None).cast("long").alias("fetch_seq"),
        F.col("url"),
        F.col("canonical_url"),
        F.col("url_hash"),
        F.col("host"),
        F.col("depth"),
        F.lit(status).alias("status"),
    )


def _hll_key(seen_like: DataFrame) -> DataFrame:
    """HLL key prep for url_hash rows: fold the signed 64-bit hash
    into 31 bits so the sketch's Knuth multiply (k * 2654435761)
    stays inside a signed long — a hash of a hash is still a hash."""
    return seen_like.select(
        F.pmod(F.col("url_hash"), F.lit(1 << 31)).cast("long").alias("k")
    )


def _seen_ops(cfg: CrawlConfig):
    """(enabled, build, update, split, params, label_prefix) for the
    configured seen-filter arm — bloom (OR-mergeable bitmaps) or
    cuckoo (deletable fingerprints), both fronting the same exact
    confirmation."""
    if cfg.seen_filter == "cuckoo":
        params = cfg.cuckoo or _cuckoo.CuckooParams()
        return (
            True,
            _cuckoo.build_blocks,
            _cuckoo.update_blocks,
            _cuckoo.split_new_urls_cuckoo,
            params,
            "cuckoo",
        )
    return (
        cfg.bloom is not None,
        build_blocks,
        update_blocks,
        split_new_urls,
        cfg.bloom or BloomParams(),
        "bloom",
    )


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.pages = pages
        # Pin the robots dim to JVM-resident blocks ONCE. It is
        # broadcast twice per round (robots filter + crawl-delay join);
        # a createDataFrame(list)-backed plan would re-evaluate its
        # python parallelize lineage through python workers on every
        # broadcast — the stalls dwarf the broadcast itself.
        self.robots = robots.localCheckpoint(eager=True)
        self.cfg = config or CrawlConfig()
        # round state goes through the pluggable TableStore (T6):
        # memory / parquet+manifest / Iceberg — plans/store.py
        self.store = make_store(spark, self.cfg.checkpoint_dir)
        # offsite dim pinned ONCE like the robots dim (it broadcasts
        # every round)
        self.domains = (
            domains_dim(spark, self.cfg.allowed_domains)
            if self.cfg.allowed_domains
            else None
        )
        # host-rank dim likewise pinned once (broadcast per round at
        # seed + link priority assignment)
        self.host_ranks = (
            self.cfg.host_ranks.localCheckpoint(eager=True)
            if self.cfg.host_ranks is not None
            else None
        )
        # immutable seen-snapshot tier (set by freeze_seen_snapshot /
        # reloaded by resume): (shard, data) xor8 blobs + the round
        # they were committed under
        self.xor_filters: DataFrame | None = None
        self._xor_round: int | None = None
        # recrawl policy state (slim per-host relation) — None until
        # the first round's observations fold in (or resume reattaches)
        self.policy_state: DataFrame | None = None
        if self.cfg.recrawl_policy is not None:
            from ..operators.recrawl import POLICIES

            assert self.cfg.recrawl_policy in POLICIES, (
                f"recrawl_policy must be one of {POLICIES}"
            )

    def _prioritize(self, df: DataFrame) -> DataFrame:
        """priority column per the configured policy: host-rank-driven
        (O3: rank x W - depth) when ranks are supplied, flat default
        otherwise; plus the optional recrawl-policy boost
        (base + recrawl_weight * boost(host)) once per-host state
        exists. Requires host/depth columns."""
        if self.host_ranks is None:
            df = df.withColumn("priority", priority_col())
        else:
            from ..operators.hostrank import with_host_rank

            df = with_host_rank(df, self.host_ranks)
        if self.cfg.recrawl_policy is not None and self.policy_state is not None:
            from ..operators.recrawl import policy_boosts

            boosts = policy_boosts(
                self.policy_state, self.cfg.recrawl_policy
            )
            df = (
                df.join(F.broadcast(boosts), "host", "left")
                .withColumn(
                    "priority",
                    F.col("priority")
                    + F.lit(self.cfg.recrawl_weight)
                    * F.coalesce(
                        F.col("boost"),
                        F.lit(self.cfg.recrawl_unseen_boost),
                    ),
                )
                .drop("boost")
            )
        return df

    # -- state helpers ------------------------------------------------

    def _materialize(self, df: DataFrame, round_no: int, name: str) -> DataFrame:
        """Cut lineage each round through the store (durable write +
        lineage-free reader when persistent, localCheckpoint in
        memory mode)."""
        return self.store.write(df, round_no, name)

    def _commit_round(self, round_no: int, info: dict) -> None:
        self.store.commit_round(round_no, info)

    # -- seed prep ----------------------------------------------------

    def seed_frontier_df(self, seeds: DataFrame) -> DataFrame:
        """Seed from a DataFrame of (url, source, parse_family, depth,
        retry_count, meta) — the 10^10-scale path where seeds live in a
        table, not a driver list."""
        df = self._prioritize(with_url_identity(seeds)).filter(_valid_url())
        w = Window.partitionBy("canonical_url").orderBy("url")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .select(*FRONTIER_COLS)
        )

    def seed_frontier(self, seed_rows: list[dict]) -> DataFrame:
        df = self.spark.createDataFrame(
            [
                {
                    "url": s["url"],
                    "source": s["source"],
                    "parse_family": s["parse_family"],
                    "depth": int(s.get("depth", 0)),
                    "retry_count": 0,
                    "meta": s.get("meta") or {},
                }
                for s in seed_rows
            ],
            schema=T.StructType(
                [
                    T.StructField("url", T.StringType(), False),
                    T.StructField("source", T.StringType(), False),
                    T.StructField("parse_family", T.StringType(), False),
                    T.StructField("depth", T.IntegerType(), False),
                    T.StructField("retry_count", T.IntegerType(), False),
                    T.StructField(
                        "meta", T.MapType(T.StringType(), T.StringType()), True
                    ),
                ]
            ),
        )
        # scheduled => seen (dupefilter marks at enqueue); dedup seeds
        return self.seed_frontier_df(df)

    # -- entry points --------------------------------------------------

    def bootstrap(
        self, seed_rows: list[dict] | DataFrame
    ) -> tuple[DataFrame, DataFrame, DataFrame | None]:
        """Materialize round-0 state (frontier, seen, bloom blocks).
        Separated from the round loop so a steady-state benchmark can
        time rounds alone — a production crawl amortizes this one-time
        bootstrap over thousands of rounds."""
        frontier = (
            self.seed_frontier_df(seed_rows)
            if isinstance(seed_rows, DataFrame)
            else self.seed_frontier(seed_rows)
        )
        seen = frontier.select("canonical_url", "url_hash")
        f_on, f_build, _, _, f_params, _ = _seen_ops(self.cfg)
        blocks = (
            f_build(seen.select("url_hash"), f_params) if f_on else None
        )
        frontier = self._materialize(frontier, 0, "frontier")
        seen = self._materialize(seen, 0, "seen_delta")
        if blocks is not None:
            blocks = self._materialize(blocks, 0, "blocks")
        self._commit_round(0, {"round": 0, "fetch_seq_offset": 0, "metrics": []})
        return frontier, seen, blocks

    def run_rounds(
        self,
        frontier: DataFrame,
        seen: DataFrame,
        blocks: DataFrame | None,
    ) -> CrawlResult:
        return self._loop(frontier, seen, blocks, 1, 0, [])

    def run(self, seed_rows: list[dict] | DataFrame) -> CrawlResult:
        frontier, seen, blocks = self.bootstrap(seed_rows)
        return self._loop(frontier, seen, blocks, 1, 0, [])

    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame,
        config: CrawlConfig,
    ) -> CrawlResult:
        """Resume from the greatest committed round in checkpoint_dir
        (T6 — per-round atomic commit, exact restart)."""
        assert config.checkpoint_dir, "resume requires checkpoint_dir"
        eng = cls(spark, pages, robots, config)
        committed = eng.store.committed_rounds()
        assert committed, "nothing committed to resume from"
        info = eng.store.round_info(committed[-1])
        last_no = info["round"]
        frontier = eng.store.read(last_no, "frontier", FRONTIER_SCHEMA)
        seen = eng.store.read_many(committed, "seen_delta", SEEN_SCHEMA)
        blocks = (
            eng.store.read(last_no, "blocks", BLOOM_BLOCK_SCHEMA)
            if _seen_ops(config)[0]
            else None
        )
        xr = info.get("xor_snapshot_round")
        if xr is not None:
            from ..schema import XOR_SNAPSHOT_SCHEMA

            eng.xor_filters = eng.store.read(
                xr, "xor_snapshot", XOR_SNAPSHOT_SCHEMA
            ).localCheckpoint(eager=True)
            eng._xor_round = xr
        if config.recrawl_policy is not None and last_no >= 1:
            from ..operators.recrawl import POLICY_STATE_SCHEMA

            try:
                eng.policy_state = eng.store.read(
                    last_no, "policy_state", POLICY_STATE_SCHEMA
                )
            except Exception:
                # policy enabled only AFTER the checkpointed rounds ran:
                # no state table exists yet — start the fold cold, same
                # as a fresh crawl's first round
                eng.policy_state = None
        return eng._loop(
            frontier,
            seen,
            blocks,
            last_no + 1,
            info["fetch_seq_offset"],
            list(info.get("metrics", [])),
        )

    # -- seen-snapshot freeze (xor arm) ---------------------------------

    def freeze_seen_snapshot(
        self, seen: DataFrame, blocks: DataFrame | None
    ) -> tuple[DataFrame | None, DataFrame]:
        """Freeze the full exact seen set into the IMMUTABLE xor-filter
        snapshot tier (operators/xorfilter — Graf & Lemire 2020) and
        reset the mutable bloom/cuckoo arm to empty, so from here on
        the mutable arm carries only POST-freeze deltas. This is the
        compaction product a long-running crawl periodically cuts: the
        10^10-key historical seen mass served at ~10 bits/key from
        broadcast-able immutable blobs (exactly 3 loads per probe, no
        false negatives), while the per-round filter state stays
        O(new URLs since last freeze).

        Exactness is preserved by construction: the round loop drops a
        candidate via the snapshot only when the xor probe is positive
        AND the exact seen table confirms it — so a later ``retract``
        needs no snapshot rebuild (the retracted row leaves the exact
        table; its lingering xor fingerprint degrades into an ordinary
        false positive that the confirm rescues).

        Persistent stores get the blobs as a ``xor_snapshot`` table
        under the last committed round plus manifest metadata, so
        :meth:`resume` reattaches the tier; every subsequent round's
        manifest carries the pointer forward.

        Returns ``(blocks', filters)`` — the reset mutable arm and the
        snapshot blobs; continue with ``run_rounds(frontier, seen,
        blocks')``.
        """
        from ..operators.xorfilter import build_shard_filters
        from ..schema import XOR_SNAPSHOT_SCHEMA  # noqa: F401  (schema home)

        n_shards = self.cfg.xor_snapshot_shards
        filters = build_shard_filters(
            seen.select("url_hash"), n_shards=n_shards
        )
        f_on, f_build, _, _, f_params, _ = _seen_ops(self.cfg)
        new_blocks = (
            f_build(seen.select("url_hash").limit(0), f_params) if f_on else None
        )
        if self.store.persistent:
            last = self.store.committed_rounds()[-1]
            filters = self._materialize(filters, last, "xor_snapshot")
            if new_blocks is not None:
                new_blocks = self._materialize(new_blocks, last, "blocks")
            info = self.store.round_info(last)
            info["xor_snapshot_round"] = last
            info["xor_snapshot_shards"] = n_shards
            self._commit_round(last, info)
            self._xor_round = last
        else:
            filters = filters.localCheckpoint(eager=True)
            if new_blocks is not None:
                new_blocks = new_blocks.localCheckpoint(eager=True)
        self.xor_filters = filters
        return new_blocks, filters

    # -- frontier retraction (cuckoo arm) -------------------------------

    def retract(
        self,
        seen: DataFrame,
        blocks: DataFrame | None,
        urls: "list[str] | DataFrame",
        rebuild: bool = False,
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """Remove URLs from the seen set mid-crawl so a later round
        re-fetches them — the operation the cuckoo arm exists for
        (deletable fingerprints; a bloom filter cannot retract). The
        production trigger is a policy change invalidating previously
        fetched URLs: a robots rule flip, a recrawl decision from the
        CDC diff, a takedown.

        Path: canonicalize ``urls`` -> keep only rows actually in
        ``seen`` (the cuckoo deletion precondition: never delete what
        was not inserted) -> anti-join them out of the exact table and
        :func:`~..operators.cuckoo.delete_from_blocks` their hashes
        out of the filter blocks. With ``rebuild=True`` the blocks are
        rebuilt from the updated exact table instead — one full pass,
        immune to the documented fingerprint-collision caveat (a key
        whose (bucket, fp) collides with a retracted key may read
        definite-new afterward and be re-fetched once; benign for a
        crawler, pinned in tests/test_cuckoo.py).

        Persistent store: the committed seen deltas are REWRITTEN
        minus the retracted rows (compaction with a filter — the
        union-of-deltas read model has no tombstones) and the updated
        blocks land under the latest committed round, so resume()
        observes the retraction exactly.

        Returns (seen', blocks', retracted) where ``retracted`` is the
        (canonical_url, url_hash) rows actually removed.
        """
        if self.cfg.seen_filter != "cuckoo":
            raise ValueError(
                "frontier retraction requires seen_filter='cuckoo' — "
                "bloom bitmaps cannot delete (P7/T5 design note)"
            )
        if isinstance(urls, list):
            urls = self.spark.createDataFrame(
                [(u,) for u in urls], "url string"
            )
        retracted = (
            with_url_identity(urls)
            .select("canonical_url", "url_hash")
            .distinct()
            .join(seen, ["canonical_url", "url_hash"], "left_semi")
            .localCheckpoint(eager=True)
        )
        params = _seen_ops(self.cfg)[4]
        new_seen = seen.join(
            retracted.select("canonical_url"), "canonical_url", "left_anti"
        )
        if blocks is not None:
            if rebuild:
                new_blocks = _cuckoo.build_blocks(
                    new_seen.select("url_hash"), params
                )
            else:
                new_blocks = _cuckoo.delete_from_blocks(
                    blocks, retracted.select("url_hash"), params
                )
        else:
            new_blocks = None
        if self.store.persistent:
            from .store import IcebergStore, compact_deltas, compact_deltas_iceberg

            _minus = lambda df: df.join(  # noqa: E731
                retracted.select("canonical_url"), "canonical_url", "left_anti"
            )
            if isinstance(self.store, IcebergStore):
                compact_deltas_iceberg(self.store, "seen_delta", transform=_minus)
            else:
                compact_deltas(
                    self.store, SEEN_SCHEMA, "seen_delta", transform=_minus
                )
            new_seen = self.store.read_many(
                self.store.committed_rounds(), "seen_delta", SEEN_SCHEMA
            )
            if new_blocks is not None:
                last = self.store.committed_rounds()[-1]
                new_blocks = self._materialize(new_blocks, last, "blocks")
        elif new_blocks is not None:
            new_blocks = new_blocks.localCheckpoint(eager=True)
        return new_seen, new_blocks, retracted

    def retract_for_robots(
        self,
        seen: DataFrame,
        blocks: DataFrame | None,
        robots: DataFrame | None = None,
        rebuild: bool = False,
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """The production retraction trigger (the VERDICT r3 scenario):
        a robots.txt rule CHANGE mid-crawl invalidates previously
        fetched URLs. Computes the seen rows that are DISALLOWED under
        ``robots`` (pass the UPDATED dim; defaults to the engine's
        pinned one) using robots_split's exact prefix semantics —
        broadcast dim against the seen table, never a seen shuffle —
        and retracts them through :meth:`retract`. The affected URLs
        leave the seen set (and the cuckoo filter), and the round
        loop's robots gate keeps them unfetched for as long as the
        rule stands; if the rule is later relaxed they are simply
        rediscoverable, with no stale seen entry in the way.
        """
        robots = self.robots if robots is None else robots
        seen_hosted = seen.withColumn(
            "host", host_col(F.col("canonical_url"))
        )
        _, disallowed = robots_split(seen_hosted, robots)
        return self.retract(
            seen,
            blocks,
            disallowed.select(F.col("canonical_url").alias("url")),
            rebuild=rebuild,
        )

    # -- the round loop -------------------------------------------------

    def _loop(
        self,
        frontier: DataFrame,
        seen: DataFrame,
        blocks: DataFrame | None,
        start_round: int,
        fetch_seq_offset: int,
        metrics: list[dict],
    ) -> CrawlResult:
        cfg = self.cfg
        records_parts: list[DataFrame] = []
        log_parts: list[DataFrame] = []
        done_rounds: list[int] = []
        round_no = start_round
        pool = ThreadPoolExecutor(max_workers=4, thread_name_prefix="mat")
        try:
            return self._loop_body(
                frontier, seen, blocks, start_round, fetch_seq_offset,
                metrics, pool, records_parts, log_parts, done_rounds,
            )
        finally:
            # a failed round must not leak the 4 'mat' threads for the
            # life of the session (repeated failed runs would pool up)
            pool.shutdown(wait=False)

    def _loop_body(
        self,
        frontier: DataFrame,
        seen: DataFrame,
        blocks: DataFrame | None,
        start_round: int,
        fetch_seq_offset: int,
        metrics: list[dict],
        pool: ThreadPoolExecutor,
        records_parts: list[DataFrame],
        log_parts: list[DataFrame],
        done_rounds: list[int],
    ) -> CrawlResult:
        cfg = self.cfg
        round_no = start_round
        hll_regs = None
        if cfg.seen_hll_log2m:
            from ..operators.sketches import hll_registers

            # bootstrap the register state from the incoming seen set
            # (one pass at loop entry — resume included); thereafter
            # only per-round DELTAS are sketched and merged.
            hll_regs = hll_registers(
                _hll_key(seen), "k", cfg.seen_hll_log2m
            ).localCheckpoint(eager=True)
        while round_no <= cfg.max_rounds and not frontier.isEmpty():
            allowed, robots_dropped = robots_split(frontier, self.robots)
            selected, _ = quota_split(
                with_crawl_delay(allowed, self.robots),
                cfg.round_budget,
                cfg.quota_salts,
            )
            if cfg.round_capacity is not None:
                # global top-K by (priority desc, host, rank_in_host):
                # a sort-limit compiles to TakeOrderedAndProject —
                # per-partition top-K then a single merge of K rows,
                # never a full global sort. Overflow rows defer.
                selected = selected.orderBy(
                    F.desc("priority"), F.asc("host"), F.asc("rank_in_host")
                ).limit(cfg.round_capacity).localCheckpoint(eager=True)
            selected = selected.persist()
            # deferred = allowed ∖ selected, re-derived from the CACHED
            # selected by one anti-join on canonical_url (the frontier
            # is unique per canonical_url — seed/intra-round/seen dedup
            # all key on it). quota_split's own deferred branch would
            # re-run BOTH politeness windows (and their full-frontier
            # shuffles) inside the next-frontier materialization job,
            # which round-5 profiling measured as the single biggest
            # per-round cost (~10 s/round at the 312k-page bench web —
            # VERDICT r4 ask #5); the anti-join reads the already-warm
            # cache instead and AQE broadcasts the selected keys when
            # they fit. Covers the round_capacity arm too:
            # allowed ∖ cut = (allowed ∖ selected) ∪ (selected ∖ cut).
            deferred = allowed.join(
                selected.select("canonical_url"), "canonical_url", "left_anti"
            )
            fetched, _ = fetch_join(selected, self.pages, cfg.fetch_strategy)
            # the html-bearing join output flows straight into extract
            # and is consumed exactly once — NEVER cached (html rows in
            # the deserialized block store are a GC storm at high
            # parallelism). ``extracted`` is the one persisted round
            # artifact (columnar in-memory cache): records ∪ links ∪
            # per-page fetch-log rows.
            extracted = run_extract(fetched).persist()
            records, links = split_records_links(extracted)
            fetched_pages = split_pages(extracted)
            # misses re-derived from the cached round tables (selected ∖
            # fetched) — never a second scan/join of the pages corpus
            missed = selected.drop("rank_in_host").join(
                fetched_pages.select("canonical_url"), "canonical_url", "left_anti"
            )

            # link identity + intra-round dedup (deterministic keeper:
            # lowest depth, then lexicographic emitting-page url).
            # canonical_url/host come pre-computed from the extract
            # pass (Spark's parse_url is interpreted and re-inlined at
            # every reference — §session.py notes); only the cheap
            # xxhash64 is added JVM-side.
            links = self._prioritize(
                links.withColumn("url_hash", F.xxhash64(F.col("canonical_url")))
            ).withColumn("retry_count", F.lit(0))
            invalid_links = links.filter(~_valid_url())
            links = links.filter(_valid_url())
            if self.domains is not None:
                links, offsite_links = offsite_split(links, self.domains)
            else:
                offsite_links = None
            # partition the intra-round dedup by the 64-bit url_hash
            # FIRST (the engine's universal URL key, north_star
            # seen-set design): the window's shuffle + sort lead on a
            # long (radix-sortable prefix) instead of a ~60-byte
            # string. canonical_url rides along as the second partition
            # key so identity stays EXACT (ADVICE r3 #3): an xxhash64
            # collision between two distinct canonical URLs co-locates
            # them but keeps their windows separate — unlike the seen
            # filter (which exact-confirms downstream), this window has
            # no rescue, so hash-only keying here would silently drop a
            # URL forever.
            w = Window.partitionBy("url_hash", "canonical_url").orderBy(
                "depth", "url"
            )
            links_dedup = (
                links.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
                .select(*FRONTIER_COLS)
            )
            _, _, f_update, f_split, f_params, f_pfx = _seen_ops(cfg)
            exact_seen = (
                seen
                if cfg.seen_confirm_join == "auto"
                else seen.hint(cfg.seen_confirm_join)
            )
            obs_xor = None
            if self.xor_filters is not None:
                # tier-1: the frozen xor snapshot. A candidate is
                # dropped here only when the probe is positive AND the
                # exact table confirms it (no false negatives, so the
                # historical seen mass never reaches the mutable arm;
                # fp rate ~2^-8 means the exact confirm touches only
                # true-seen + a sliver). Everything surviving goes to
                # the mutable arm, which post-freeze holds only the
                # delta keys.
                from ..operators.xorfilter import xor_maybe_hashes

                maybe = xor_maybe_hashes(
                    links_dedup, self.xor_filters, cfg.xor_snapshot_shards
                )
                snap_seen = (
                    links_dedup.join(maybe, "url_hash", "left_semi")
                    .join(
                        exact_seen.select("canonical_url"),
                        "canonical_url",
                        "left_semi",
                    )
                    .select("canonical_url")
                    .withColumn("_snap", F.lit(1))
                )
                # left join + flag filter (not an anti join) so the
                # drop-count Observation rides the MAIN probe path —
                # CollectMetrics under a BroadcastExchange subtree is
                # never reported back. links_dedup and snap_seen are
                # both unique per canonical_url: no row multiplication.
                flagged = links_dedup.join(snap_seen, "canonical_url", "left")
                obs_xor = Observation(f"xor_{round_no}")
                flagged = flagged.observe(
                    obs_xor,
                    F.sum(F.coalesce(F.col("_snap"), F.lit(0))).alias("dropped"),
                )
                links_for_split = flagged.filter(
                    F.col("_snap").isNull()
                ).drop("_snap")
            else:
                links_for_split = links_dedup
            new_rows, _, _ = f_split(links_for_split, blocks, exact_seen, f_params)
            # materialize ONCE; this is the round's heavy job — it
            # computes the whole selected->fetch->extract->dedup chain
            # (upstream persists fill here); everything below reads
            # cached/checkpointed data. The via-counters ride the SAME
            # job as an Observation (CollectMetrics accumulators) —
            # round 2 spent a separate stats job + collect on them.
            obs_via = Observation(f"via_{round_no}")
            new_rows = new_rows.observe(
                obs_via,
                *[
                    F.count(F.when(F.col("via") == v, 1)).alias(v)
                    for v in ("exact", f"{f_pfx}_definite", f"{f_pfx}_fp")
                ],
            )
            new_rows = self._materialize(new_rows, round_no, "new_rows")

            # retries: miss -> re-enqueue decayed, or dead-letter
            can_retry = F.col("retry_count") + 1 <= F.lit(cfg.max_retries)
            retry_rows = (
                missed.filter(can_retry)
                .withColumn("retry_count", F.col("retry_count") + 1)
                .withColumn(
                    "priority",
                    F.col("priority")
                    - F.col("retry_count")
                    - F.pmod(F.col("url_hash"), F.lit(10000)) / 10000.0,
                )
                .select(*FRONTIER_COLS)
            )
            dead_rows = missed.filter(~can_retry)

            # fetch log: fetched rows get the global crawl-order seq
            if cfg.assign_fetch_seq:
                fetched_log = assign_fetch_seq(
                    fetched_pages, round_no, fetch_seq_offset
                )
            else:
                fetched_log = _log_rows(fetched_pages, round_no, "fetched")
            round_log = fetched_log.select(*LOG_COLS)
            for df, status in (
                (robots_dropped, "robots_dropped"),
                (retry_rows, "retry"),
                (dead_rows, "dead"),
                (invalid_links, "invalid"),
            ):
                round_log = round_log.unionByName(_log_rows(df, round_no, status))
            if offsite_links is not None:
                round_log = round_log.unionByName(
                    _log_rows(offsite_links, round_no, "offsite")
                )

            # next-round state
            next_frontier = deferred.select(*FRONTIER_COLS).unionByName(
                retry_rows
            ).unionByName(new_rows.select(*FRONTIER_COLS))
            seen_delta = new_rows.select("canonical_url", "url_hash")

            # independent checkpoint targets run as concurrent driver
            # jobs (blocks / fetch_log / records / frontier) — per-job
            # fixed latency is the round loop's scaling tax, so walls
            # are overlapped instead of summed.
            futs = {}
            if blocks is not None:
                new_blocks = f_update(
                    blocks, seen_delta.select("url_hash"), f_params
                )
                old_blocks = blocks
                futs["blocks"] = pool.submit(
                    self._materialize, new_blocks, round_no, "blocks"
                )
            # status/record counters ride the materialization jobs as
            # Observations — no separate stats job or extra scan
            obs_log = Observation(f"log_{round_no}")
            round_log = round_log.observe(
                obs_log,
                *[
                    F.count(F.when(F.col("status") == s, 1)).alias(s)
                    for s in ("fetched", "robots_dropped", "offsite", "retry", "dead")
                ],
            )
            obs_rec = Observation(f"rec_{round_no}")
            records = records.observe(obs_rec, F.count(F.lit(1)).alias("n"))
            futs["fetch_log"] = pool.submit(
                self._materialize, round_log, round_no, "fetch_log"
            )
            futs["records"] = pool.submit(
                self._materialize, records, round_no, "records"
            )
            futs["frontier"] = pool.submit(
                self._materialize, next_frontier, round_no, "frontier"
            )
            if blocks is not None:
                blocks = futs["blocks"].result()
                old_blocks.unpersist()
            round_log = futs["fetch_log"].result()
            records = futs["records"].result()
            frontier = futs["frontier"].result()

            if cfg.recrawl_policy is not None:
                # fold this round's per-host novelty observations into
                # the policy state (operators/recrawl): both inputs are
                # the round's ALREADY-MATERIALIZED slim artifacts, the
                # state is one row per host, and the fold runs once per
                # round in round order — the sequential semantics the
                # recrawl_{ucb,ses,cusum} gates pin. Checkpointed
                # through the store so resume reattaches it exactly.
                from ..operators import recrawl as _rc

                obs = _rc.round_observations(round_log, new_rows)
                prev_state = (
                    self.policy_state
                    if self.policy_state is not None
                    else _rc.empty_state(self.spark)
                )
                self.policy_state = self._materialize(
                    _rc.update_state(prev_state, obs),
                    round_no,
                    "policy_state",
                )

            # counters came from the Observations riding the
            # materialization jobs above (round 2 ran a separate
            # combined stats job + collect over the checkpointed
            # outputs — one extra job + scan per round). `.get` blocks
            # until the observed job finishes; all three already have.
            via_counts = obs_via.get
            status_counts = obs_log.get
            hot_hosts = None
            if cfg.hot_hosts_k:
                from ..operators.sketches import heavy_hitters

                # sketch over the round's ALREADY-MATERIALIZED fetch
                # log (no recompute of the round chain): per-partition
                # MG counters, O(parts x capacity) rows to the driver-
                # side top-k — never a full per-host groupBy collect.
                hh = heavy_hitters(
                    round_log.filter(F.col("status") == "fetched"),
                    "host",
                    cfg.hot_hosts_k,
                    capacity=cfg.hot_hosts_capacity,
                ).collect()
                hot_hosts = [[r["host"], r["n"]] for r in hh]
                hot_hosts_err = hh[0]["max_err"] if hh else 0
            m = {
                "round": round_no,
                "fetched": status_counts["fetched"],
                "robots_dropped": status_counts["robots_dropped"],
                "offsite": status_counts["offsite"],
                "retry": status_counts["retry"],
                "dead": status_counts["dead"],
                "records": obs_rec.get["n"],
                "new_urls": sum(via_counts.values()),
                # zero -> None preserves the round-2 metric shape
                # (key absent when no rows carried that via)
                f"{f_pfx}_definite_new": via_counts[f"{f_pfx}_definite"]
                or None,
                f"{f_pfx}_fp": via_counts[f"{f_pfx}_fp"] or None,
            }
            if hot_hosts is not None:
                m["hot_hosts"] = hot_hosts
                m["hot_hosts_max_err"] = hot_hosts_err
            if obs_xor is not None:
                # tier-1 snapshot drops (rode the new_rows job as an
                # Observation like the via counters; sum is NULL on an
                # empty link set). Unlike obs_via — observed at the
                # job's materialized ROOT — this node sits mid-plan,
                # and AQE's empty-relation propagation folds it away
                # entirely when the round produced no candidate links;
                # the metric row then comes back unconvertible. In
                # every such fold the true count is 0 (only an empty
                # input is folded), so that is what we record.
                try:
                    m["xor_snapshot_dropped"] = int(obs_xor.get["dropped"] or 0)
                except Exception:
                    m["xor_snapshot_dropped"] = 0
            if hll_regs is not None:
                from ..operators.sketches import hll_estimate, hll_registers

                # merge the delta's registers by max (associative,
                # idempotent — a replayed round changes nothing), keep
                # the tiny (<= 2^log2m rows) state flat via checkpoint
                hll_regs = (
                    hll_regs.unionByName(
                        hll_registers(
                            _hll_key(seen_delta), "k", cfg.seen_hll_log2m
                        )
                    )
                    .groupBy("reg")
                    .agg(F.max("mr").alias("mr"))
                    .localCheckpoint(eager=True)
                )
                m["seen_distinct_est"] = hll_estimate(
                    hll_regs, cfg.seen_hll_log2m
                ).collect()[0]["est"]
            fetch_seq_offset += m["fetched"]

            if self.store.persistent:
                # resume reads seen deltas per round: persist the slim
                # projection (cheap rewrite of already-materialized
                # rows), then rebuild `seen` as ONE flat multi-path
                # parquet scan of every delta so far — a per-round
                # unionByName fold would grow the plan O(rounds) deep.
                self._materialize(seen_delta, round_no, "seen_delta")
                seen = self.store.read_many(
                    self.store.committed_rounds() + [round_no],
                    "seen_delta",
                    SEEN_SCHEMA,
                )
            else:
                # memory mode: deltas are checkpointed leaves, the
                # union fold stays flat-leaf and is bounded by
                # max_rounds
                seen = seen.unionByName(seen_delta)

            records_parts.append(records)
            log_parts.append(round_log)
            done_rounds.append(round_no)
            metrics.append(m)
            round_info = {
                "round": round_no,
                "fetch_seq_offset": fetch_seq_offset,
                "metrics": metrics,
            }
            if self._xor_round is not None:
                # carry the snapshot pointer forward so resume() from
                # ANY later round reattaches the tier
                round_info["xor_snapshot_round"] = self._xor_round
                round_info["xor_snapshot_shards"] = cfg.xor_snapshot_shards
            self._commit_round(round_no, round_info)
            selected.unpersist()
            extracted.unpersist()

            round_no += 1

        rec_schema = T.StructType(
            [
                T.StructField("url", T.StringType(), False),
                T.StructField("source", T.StringType(), False),
                T.StructField("item_index", T.IntegerType(), True),
            ]
            + [T.StructField(f, T.StringType(), True) for f in FEED_EXPORT_FIELDS]
        )
        if self.store.persistent and done_rounds:
            # flat assembly: ONE store scan over all committed rounds
            # instead of folding unionByName O(rounds) deep — the
            # result plan is a single scan regardless of round count.
            all_records = self.store.read_many(done_rounds, "records", rec_schema)
            all_log = self.store.read_many(
                done_rounds, "fetch_log", FETCH_LOG_SCHEMA
            )
        else:
            # in-memory mode: parts are localCheckpoint-backed, the
            # fold is bounded by max_rounds (<= 64)
            all_records = self.spark.createDataFrame([], rec_schema)
            for p in records_parts:
                all_records = all_records.unionByName(p)
            all_log = self.spark.createDataFrame([], FETCH_LOG_SCHEMA)
            for p in log_parts:
                all_log = all_log.unionByName(p)
        return CrawlResult(all_records, all_log, seen, metrics, blocks)
