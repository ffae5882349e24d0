"""Document deduplication operators — exact, n-gram Jaccard,
MinHash+LSH, SimHash.

These are the dedup stages of a web-scale training-data pipeline (the
100 TB story): every operator is expressed as DataFrame ops over the
shared 60-bit md5 hash (functions/hashing.py) so its result is
bit-comparable with a DuckDB SQL oracle.

Scale design notes:
- exact dedup: one hash-partitioned groupBy on the fingerprint — the
  minimum possible shuffle (map-side partial agg applies).
- n-gram Jaccard: shingle explode -> self-join on shingle. The join
  key (shingle) is the natural partitioner; hot shingles (stopword
  trigrams) are the skew risk — AQE skew-join handles moderate skew,
  and a document-frequency cap (drop shingles appearing in > DF_CAP
  docs) bounds the worst case, standard practice for LSH pipelines.
- MinHash/LSH: signatures via one explode + groupBy(min) pass — b*r
  hash evaluations per shingle, all JVM-side; banding turns the
  quadratic pair search into equi-joins on (band, band_hash).
- SimHash: 60 bit-majority aggregations in ONE groupBy pass, then
  pigeonhole banding (4 x 15-bit chunks) for hamming<=3 candidate
  pairs, verified with bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60_col, h60_sql
from ..functions.textstats import fingerprint_col, fingerprint_sql

# ---------------------------------------------------------------------------
# shingling (shared contract with the SQL oracle)
# ---------------------------------------------------------------------------

SHINGLE_K = 3


def tokens_col(text):
    return F.split(F.trim(F.lower(text)), r"\s+")


def shingles(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct word-3-gram shingles per doc."""
    toks = docs.select(id_col, tokens_col(F.col("text")).alias("toks"))
    sh = toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - SHINGLE_K, F.lit(0))),
                lambda i: F.array_join(F.slice("toks", i + 1, SHINGLE_K), " "),
            )
        ).alias("shingle"),
    )
    return sh.distinct()


SHINGLES_SQL = """
    SELECT DISTINCT doc_id,
           array_to_string(toks[i + 1 : i + 3], ' ') AS shingle
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
          FROM {docs}),
         UNNEST(range(0, greatest(len(toks) - 3, 0) + 1)) AS t(i)
"""

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Fingerprint groups with >1 member + their representative
    (min doc_id) — the classic exact-dedup reduce."""
    return (
        docs.select("doc_id", fingerprint_col(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
    )


EXACT_DEDUP_SQL = f"""
    SELECT {fingerprint_sql('text')} AS fp,
           min(doc_id) AS keep_doc_id, count(*) AS n_dups
    FROM documents GROUP BY 1
"""

# ---------------------------------------------------------------------------
# n-gram Jaccard pairs (brute force via shingle join)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    sh: DataFrame, threshold: float = 0.5, df_cap: int | None = None
) -> DataFrame:
    """All doc pairs with shingle-set Jaccard >= threshold.
    sh: (doc_id, shingle) distinct.

    ``df_cap`` is the document-frequency cap on hot shingles: shingles
    appearing in more than df_cap docs are removed from the shingle
    universe BEFORE the self-join (sizes and intersections are then
    both computed over the capped universe, so the Jaccard stays
    internally consistent). Without it a single stopword trigram in d
    docs contributes d^2 join rows — quadratic in the hottest key at
    100 TB. With it the self-join fan-out is bounded by df_cap per
    shingle. The hot-shingle list is tiny (it's the frequency tail's
    head), so the anti-join broadcasts.
    """
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > df_cap)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    # sh is referenced THREE times below (sizes + both self-join
    # sides); Spark does not dedupe common sub-plans across different
    # shuffle keys, so without a persist the whole shingle pipeline
    # (and whatever produced `docs`) evaluates 3x. One materialization
    # instead — at 100 TB that is one corpus scan, not three.
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_pairs_sql(
    docs_rel: str, threshold: float, df_cap: int | None = None
) -> str:
    cap_cte = (
        f""",
    sh AS (SELECT sh_all.* FROM sh_all
           JOIN (SELECT shingle FROM sh_all
                 GROUP BY 1 HAVING count(*) <= {df_cap}) ok USING (shingle))"""
        if df_cap is not None
        else ""
    )
    first = "sh_all" if df_cap is not None else "sh"
    return f"""
    WITH {first} AS ({SHINGLES_SQL.format(docs=docs_rel)}){cap_cte},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= {threshold}
    """

# ---------------------------------------------------------------------------
# deterministic near-dup augmentation (non-vacuous dedup gates)
# ---------------------------------------------------------------------------

def variant_id_expr():
    """Variant doc-id mapping: ``-doc_id - 1``. Real doc_ids are
    non-negative, so the variant id space is disjoint from the corpus
    at ANY scale factor — the round-2 fixed-offset mapping
    (doc_id ± 1e6) collided with real ids once the corpus passed 1e6
    documents, silently corrupting the dedup gates. Negation also
    sorts every variant BELOW its base doc, so min-label cluster
    representatives land on the variant and the keep-filter's drop set
    provably intersects the real corpus (non-vacuous gate)."""
    return (-F.col("doc_id") - 1).alias("doc_id")


def docs_with_variants(docs: DataFrame, mod: int) -> DataFrame:
    """(doc_id, text) of every doc with doc_id % mod == 0 plus a
    deterministic near-duplicate variant of each (id ``-doc_id - 1``,
    text minus its first two tokens).

    The driver's synthetic ``documents`` corpus contains no natural
    near-dup pairs (max pairwise trigram Jaccard ~0.04), so a dedup
    operator gated only on that corpus passes vacuously — it can never
    find anything. This augmentation plants one true near-dup per
    selected doc (Jaccard >= (S-2)/S ~ 0.97 for ~100-token docs,
    far above any test threshold) while leaving cross-doc similarity
    untouched, so the gate exercises real positives at every scale
    factor. Mirrored exactly by :func:`docs_with_variants_sql`.
    """
    base = docs.filter(f"doc_id % {mod} = 0").select("doc_id", "text")
    variant = base.select(
        variant_id_expr(),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 3, 1 << 20), " "
        ).alias("text"),
    )
    return base.unionByName(variant)


def docs_with_variants_sql(docs_rel: str, mod: int) -> str:
    return f"""(
      SELECT doc_id, text FROM {docs_rel} WHERE doc_id % {mod} = 0
      UNION ALL
      SELECT -doc_id - 1 AS doc_id,
             array_to_string(string_split(text, ' ')[3:], ' ') AS text
      FROM {docs_rel} WHERE doc_id % {mod} = 0)"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

MINHASH_BANDS = 32
MINHASH_ROWS = 2  # 64 hash functions; P(miss | j>=0.8) ~ 1e-14


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) — LSH band buckets from 64 min-hashes.

    hash_i(shingle) = xxhash64('i|' || shingle); ALL 64 minima are
    computed in ONE groupBy(doc_id) with 64 min() aggregates — a
    single shuffle with map-side partial aggregation and no row
    multiplication (the naive explode-by-hash-id plan is 64x the rows
    plus two shuffles). Band keys are xxhash64 over the band's row
    minima — internal equality keys only; correctness is guaranteed by
    the exact-Jaccard verification downstream, so the cheap hash is
    safe here.
    """
    n_hashes = MINHASH_BANDS * MINHASH_ROWS
    mins = [
        F.min(
            F.xxhash64(F.concat(F.lit(f"{i}|"), F.col("shingle")))
        ).alias(f"m{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"m{b + k * MINHASH_BANDS}") for k in range(MINHASH_ROWS)]
            ).alias("band_key"),
        )
        for b in range(MINHASH_BANDS)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "bk.band", "bk.band_key")


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Near-dup pairs via MinHash banding, exact-verified with true
    Jaccard — candidates come from band-bucket equi-joins (the scale
    path), the verification keeps results exact."""
    # sh feeds both the signature aggregation and the exact-verify
    # semi-join; cands is referenced three times (both legs of the
    # cand_docs union + the final join). Persist each once — without
    # this the shingle pass ran ~3x per query (round-2 BENCH:
    # dedup_minhash_lsh 18.3 s, mostly recompute multiplication).
    sh = shingles(docs).persist()
    bands = minhash_signatures(sh)
    a = bands.alias("a")
    b = bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .persist()
    )
    # exact verification restricted to candidate docs only — this is
    # what makes LSH the scale path: jaccard is computed on the tiny
    # candidate set, never all O(n^2) pairs.
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_cand = sh.join(cand_docs, "doc_id", "left_semi")
    exact = jaccard_pairs(sh_cand, threshold)
    return cands.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "jaccard"
    )

# ---------------------------------------------------------------------------
# dedup clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def dedup_clusters(pairs: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components over near-dup pairs: (doc_id, cluster_id)
    where cluster_id = min doc_id in the component — the step a
    training pipeline runs after pair-finding, so each duplicate
    GROUP keeps exactly one representative (keep doc_id==cluster_id).

    Algorithm: min-label propagation WITH pointer doubling (round 3).
    Per iteration: one join (labels against the bidirectional edge
    list) + one groupBy min + one label(label) self-join — all
    hash-partitioned on doc_id, map-side combinable. The doubling step
    halves every label chain, so convergence is O(log diameter) (the
    large-star/small-star bound) instead of O(diameter): adversarial
    long chains — the round-2 advisor's silent-nonconvergence case —
    finish in ~log2 iterations, and hitting the cap raises instead of
    returning split clusters. The driver loop localCheckpoints each
    iteration and stops at fixpoint (counted changes == 0, folded into
    the same aggregation). At 10^9 nodes each iteration is a bounded
    shuffle of the (node, label) relation only.
    """
    # the incoming pair relation is usually the entire LSH + verify
    # pipeline — it is referenced TWICE in the bidirectional union, so
    # persist before fanning out (round 2 evaluated the whole pipeline
    # twice; at 100 TB that is one shingle pass instead of two)
    pairs = pairs.persist()
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs.unpersist()
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iters):
        neighbor_labels = (
            edges.join(labels, edges["b"] == labels["doc_id"])
            .select(
                F.col("a").alias("doc_id"),
                "label",
                F.lit(None).cast("long").alias("old_label"),
            )
        )
        # convergence detection is FOLDED into the same aggregation:
        # each doc_id has exactly one "own" row carrying old_label, so
        # min(label) vs min(old_label) decides change per key without
        # the extra join+job round 2 spent per iteration
        cand = (
            labels.select("doc_id", "label", F.col("label").alias("old_label"))
            .unionByName(neighbor_labels)
            .groupBy("doc_id")
            .agg(
                F.min("label").alias("label"),
                F.min("old_label").alias("old_label"),
            )
        )
        # pointer doubling (path compression): label <- label(label).
        # Labels are always node ids, so the self-join resolves each
        # label one more hop toward the component minimum — combined
        # with the neighbor-min step, convergence is O(log diameter)
        # instead of O(diameter) (the large-star/small-star bound),
        # for one extra equi-join per iteration. A 10^4-long chain
        # converges in ~14 iterations instead of 10^4.
        l2 = cand.select(
            F.col("doc_id").alias("_p"), F.col("label").alias("_plabel")
        )
        new_labels = (
            cand.join(l2, cand["label"] == l2["_p"], "left")
            .select(
                "doc_id",
                F.coalesce("_plabel", "label").alias("label"),
                "old_label",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(
            F.col("label") != F.col("old_label")
        ).count()  # cheap: scans the just-checkpointed relation only
        labels = new_labels.select("doc_id", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        # a component whose diameter exceeds max_iters would silently
        # keep wrong (split) cluster ids — fail loudly instead; the
        # large-star/small-star variant is the drop-in if adversarial
        # long chains ever appear in a real corpus
        raise RuntimeError(
            f"dedup_clusters: min-label propagation did not reach a "
            f"fixpoint within {max_iters} iterations (component "
            f"diameter too large); raise max_iters or switch to the "
            f"large-star/small-star variant"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def dedup_clusters_sql(pairs_sql: str) -> str:
    """Recursive-CTE oracle: transitive closure over the undirected
    pair relation, cluster id = min reachable node."""
    return f"""
    WITH RECURSIVE pair_rel AS ({pairs_sql}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pair_rel
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pair_rel
    ),
    nodes AS (SELECT DISTINCT a AS doc_id FROM edges),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT src AS doc_id, min(dst) AS cluster_id
    FROM reach GROUP BY 1
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4  # pigeonhole for hamming <= SIMHASH_CHUNKS - 1


def simhash_col_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 60-bit bit-majority over distinct-token
    h60 hashes, computed in one groupBy with 60 conditional sums."""
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).distinct()
    h = toks.select("doc_id", h60_col(F.col("tok")).alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = h.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2 ** j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_sql(docs_rel: str) -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    sim = " + ".join(
        f"CASE WHEN b{j} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
            FROM {docs_rel})),
    h AS (SELECT doc_id, {h60_sql('tok')} AS h FROM toks),
    agg AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id)
    SELECT doc_id, {sim} AS simhash FROM agg
    """


def simhash_pairs_sql(docs_rel: str, max_hamming: int = 3) -> str:
    """Brute-force oracle for :func:`simhash_dup_pairs`: with
    SIMHASH_CHUNKS = max_hamming + 1 the pigeonhole banding has EXACT
    recall (any pair within hamming h <= chunks-1 shares at least one
    identical chunk), so the engine's banded join must equal the full
    O(n^2) scan."""
    return f"""
    WITH sims AS ({simhash_sql(docs_rel)})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def simhash_dup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with simhash hamming distance <= max_hamming, found via
    15-bit chunk pigeonhole joins, verified with bit_count(xor)."""
    sims = simhash_col_docs(docs)
    chunk_bits = SIMHASH_BITS // SIMHASH_CHUNKS
    chunks = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("cv"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk", "ch.cv")
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        # hamming filter BEFORE distinct: the filter is a cheap
        # codegen'd expression on the joined rows, the distinct is a
        # shuffle — filtering first shrinks the shuffle to only true
        # near-dup pairs (pairs sharing >1 chunk are the only dups).
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# benchmark contamination (eval-set n-gram overlap)
# ---------------------------------------------------------------------------


def eval_snippets(
    docs: DataFrame, mod: int = 97, skip: int = 5, length: int = 20
) -> DataFrame:
    """(eval_id, text) — a deterministic stand-in benchmark/eval set:
    tokens[skip : skip+length] of every doc with doc_id % mod == 0.
    Planted contamination with known provenance, so the contamination
    gate has guaranteed true positives at every scale factor (the same
    device as docs_with_variants for the dedup gates). Mirrored by
    :func:`eval_snippets_sql`."""
    return docs.filter(f"doc_id % {mod} = 0").select(
        F.col("doc_id").alias("eval_id"),
        F.array_join(
            F.slice(tokens_col(F.col("text")), skip + 1, length), " "
        ).alias("text"),
    )


def eval_snippets_sql(docs_rel: str, mod: int = 97, skip: int = 5, length: int = 20) -> str:
    return f"""(
      SELECT doc_id AS eval_id,
             array_to_string(
               string_split_regex(trim(lower(text)), '\\s+')[{skip + 1}:{skip + length}],
               ' ') AS text
      FROM {docs_rel} WHERE doc_id % {mod} = 0)"""


def contamination(
    docs: DataFrame, eval_set: DataFrame, min_overlap: int = 3
) -> DataFrame:
    """(doc_id, eval_id, n_common) — corpus documents sharing at least
    ``min_overlap`` word-3-gram shingles with an eval document: the
    decontamination scan a training pipeline runs before a data
    release (classic 13-gram check, SHINGLE_K-gram here).

    Scale shape: the eval set is tiny next to the corpus (thousands of
    benchmark items vs billions of docs), so its shingle relation is
    BROADCAST — the corpus is shingled in one pass and never shuffled
    for the join; the only shuffle is the map-side-combinable
    groupBy(doc_id, eval_id) count. Contaminated doc_ids then feed the
    same broadcast anti-join used by dedup_keep_documents."""
    sh_docs = shingles(docs)
    sh_eval = (
        eval_set.select(F.col("eval_id").alias("doc_id"), "text")
        .transform(shingles)
        .select(F.col("doc_id").alias("eval_id"), "shingle")
    )
    return (
        sh_docs.join(F.broadcast(sh_eval), "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_overlap)
    )


def contamination_sql(
    docs_rel: str, eval_sql: str, min_overlap: int = 3
) -> str:
    return f"""
    WITH sh_docs AS ({SHINGLES_SQL.format(docs=docs_rel)}),
    eval_set AS (SELECT eval_id AS doc_id, text FROM {eval_sql}),
    sh_eval AS (
      SELECT doc_id AS eval_id, shingle
      FROM ({SHINGLES_SQL.format(docs='eval_set')}))
    SELECT d.doc_id, e.eval_id, count(*) AS n_common
    FROM sh_docs d JOIN sh_eval e USING (shingle)
    GROUP BY d.doc_id, e.eval_id
    HAVING count(*) >= {min_overlap}
    """


# ---------------------------------------------------------------------------
# line-level (paragraph) dedup — CCNet/RefinedWeb-style boilerplate removal
# ---------------------------------------------------------------------------

# words per synthetic line; the driver's synthetic documents carry no
# newlines, so a line-dedup gated on them raw would be vacuous (every
# doc = one unique line). docs_with_lines reshapes them
# deterministically — same non-vacuity device as docs_with_variants.
_LINE_WORDS = 8
_LINE_BREAK_RE = r"((?:\S+ ){%d})" % _LINE_WORDS


def docs_with_lines(docs: DataFrame) -> DataFrame:
    """(doc_id, text) with deterministic multi-line structure: a
    per-source header line (shared by every doc of the source — real
    boilerplate), the body broken every ``_LINE_WORDS`` words, and one
    global footer line (shared by the whole corpus). Guarantees the
    line-dedup gate has planted positives at every scale factor.
    Mirrored exactly by :func:`docs_with_lines_sql`."""
    body = F.regexp_replace(F.col("text"), _LINE_BREAK_RE, "$1\n")
    text2 = F.concat(
        F.lit("<<hdr:"), F.col("source"), F.lit(">>\n"),
        body,
        F.lit("\n<<footer:terms-of-service>>"),
    )
    return docs.select("doc_id", text2.alias("text"))


def docs_with_lines_sql(docs_rel: str) -> str:
    # _LINE_BREAK_RE uses only the RE2-and-Java-common escapes (\S)
    pat = _LINE_BREAK_RE
    return f"""(
      SELECT doc_id,
             '<<hdr:' || source || '>>' || chr(10)
             || regexp_replace(text, '{pat}', '\\1' || chr(10), 'g')
             || chr(10) || '<<footer:terms-of-service>>' AS text
      FROM {docs_rel})"""


def line_dedup(docs: DataFrame) -> DataFrame:
    """Corpus-wide exact line dedup (the CCNet paragraph-dedup stage):
    each distinct line survives only at its first occurrence ordered by
    (doc_id, pos); every later copy — headers, footers, repeated
    boilerplate — is dropped, and each doc is re-assembled from its
    kept lines. Returns (doc_id, n_lines, n_kept, text_dedup).

    Scale shape: keeper selection is a map-side-combinable
    min(struct(doc_id, pos)) groupBy on the line value — NOT a window
    over occurrences, so a footer present in 10^8 docs partial-combines
    per map task instead of sorting 10^8 rows in one skewed window
    partition. One shuffle by line + one by doc_id; the corpus text is
    never joined against itself.
    """
    lines = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    )
    keepers = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "pos")).alias("k")
    )
    flagged = lines.join(keepers, "line").withColumn(
        "keep",
        (F.col("doc_id") == F.col("k.doc_id")) & (F.col("pos") == F.col("k.pos")),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "line"))
                    )
                ),
                lambda x: x["line"],
            ),
        ).alias("text_dedup"),
    )


def line_dedup_sql(docs_rel: str) -> str:
    keep = "l.doc_id = k.kd AND l.pos = k.kp"
    return f"""
    WITH docs2 AS (SELECT * FROM {docs_rel}),
    lines AS (
      SELECT doc_id, generate_subscripts(arr, 1) - 1 AS pos,
             unnest(arr) AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS arr FROM docs2)
    ),
    keepers AS (
      SELECT line, doc_id AS kd, pos AS kp FROM (
        SELECT line, doc_id, pos,
               row_number() OVER (PARTITION BY line
                                  ORDER BY doc_id, pos) AS rn
        FROM lines) WHERE rn = 1
    )
    SELECT l.doc_id, count(*) AS n_lines,
           count(CASE WHEN {keep} THEN 1 END) AS n_kept,
           coalesce(string_agg(CASE WHEN {keep} THEN l.line END,
                               chr(10) ORDER BY l.pos), '') AS text_dedup
    FROM lines l JOIN keepers k USING (line)
    GROUP BY l.doc_id
    """


# ---------------------------------------------------------------------------
# exact substring-span dedup — Lee et al. 2022 (arXiv:2107.06499) style
# ---------------------------------------------------------------------------

SPAN_K = 10  # tokens per span (the paper uses 50 BPE tokens; word-level here)


def substring_spans(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """(doc_id, span) — DISTINCT k-token rolling spans per doc, the
    unit of exact substring dedup ("ExactSubstr"): any text run of k
    tokens shared verbatim between two documents shows up as an equal
    span value in both. Same rolling shape as :func:`shingles`, wider
    window. Grouping is on the span STRING (exact semantics; a
    production run would group on xxhash64(span) — an engine-local
    optimization the oracle can't mirror bit-for-bit, so the gate
    keeps the string and the docstring records the swap)."""
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - k, F.lit(0))),
                lambda i: F.array_join(F.slice("toks", i + 1, k), " "),
            )
        ).alias("span"),
    ).distinct()


def substring_spans_sql(docs_rel: str, k: int = SPAN_K) -> str:
    return f"""
    SELECT DISTINCT doc_id,
           array_to_string(toks[i + 1 : i + {k}], ' ') AS span
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
          FROM {docs_rel}),
         UNNEST(range(0, greatest(len(toks) - {k}, 0) + 1)) AS t(i)
"""


def substring_dup_stats(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Per-doc exact-substring duplication profile:
    (doc_id, n_spans, n_dup_spans, dup_frac) where a span is "dup"
    when it occurs verbatim in >= 2 distinct documents. This is the
    detection half of ExactSubstr dedup (the cut step is a per-doc
    span-mask, same downstream shape as the line-dedup re-assembly).

    Scale shape: one shuffle of distinct spans into the occurrence
    count (map-side combinable), one equi-join back on span to flag,
    one per-doc aggregate. The span relation feeds both — persisted so
    the tokenize+explode pass runs once. No self-join of the corpus,
    no suffix array: the k-gram rolling window gives the same
    >=k-token guarantee with pure dataflow ops."""
    sp = substring_spans(docs, k).persist()
    occ = sp.groupBy("span").agg(F.count("*").alias("n_docs"))
    flagged = sp.join(occ, "span").withColumn("is_dup", F.col("n_docs") >= 2)
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.count(F.when(F.col("is_dup"), 1)).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_frac", F.round(F.col("n_dup_spans") / F.col("n_spans"), 4)
        )
        .orderBy("doc_id")
    )


def substring_dup_sql(docs_rel: str, k: int = SPAN_K) -> str:
    return f"""
    WITH sp AS ({substring_spans_sql(docs_rel, k)}),
    occ AS (SELECT span, count(*) AS n_docs FROM sp GROUP BY span)
    SELECT sp.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(count(CASE WHEN occ.n_docs >= 2 THEN 1 END) AS BIGINT)
             AS n_dup_spans,
           round(count(CASE WHEN occ.n_docs >= 2 THEN 1 END) / count(*), 4)
             AS dup_frac
    FROM sp JOIN occ USING (span)
    GROUP BY sp.doc_id ORDER BY sp.doc_id
    """


# ---------------------------------------------------------------------------
# asymmetric containment dedup (snippet-in-document detection)
# ---------------------------------------------------------------------------

CONTAIN_MIN_SHINGLES = 5


def containment_corpus(docs: DataFrame, mod: int = 9, prefix: int = 200) -> DataFrame:
    """Base docs + planted SNIPPET variants (-doc_id - 1 = first
    ``prefix`` chars of every ``mod``-th doc). A snippet's shingle set
    is a subset of its source's, so containment(snippet -> source) ~ 1
    while Jaccard stays low — the asymmetric case this operator
    exists for (quote/boilerplate/excerpt detection, which symmetric
    Jaccard misses). Mirrored exactly by :func:`containment_corpus_sql`."""
    base = docs.select("doc_id", "text")
    snippets = docs.filter(F.col("doc_id") % mod == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.substring("text", 1, prefix).alias("text"),
    )
    return base.unionByName(snippets)


def containment_corpus_sql(docs_rel: str, mod: int = 9, prefix: int = 200) -> str:
    return (
        f"(SELECT doc_id, text FROM {docs_rel} UNION ALL "
        f"SELECT -doc_id - 1 AS doc_id, substring(text, 1, {prefix}) AS text "
        f"FROM {docs_rel} WHERE doc_id % {mod} = 0)"
    )


def containment_pairs(
    sh: DataFrame, threshold: float = 0.9, df_cap: int | None = None
) -> DataFrame:
    """DIRECTED pairs (doc_a, doc_b, containment) with
    |sh(a) ∩ sh(b)| / |sh(a)| >= threshold, a != b, |sh(a)| >=
    CONTAIN_MIN_SHINGLES (tiny shingle sets are trivially contained).
    Same scale discipline as jaccard_pairs: optional broadcast DF cap
    on hot shingles, ONE persisted shingle relation feeding sizes and
    both join sides."""
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > df_cap)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    return (
        common.join(sa, "doc_a")
        .filter(F.col("na") >= CONTAIN_MIN_SHINGLES)
        .withColumn(
            "containment", F.round(F.col("n_common") / F.col("na"), 4)
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def containment_pairs_sql(
    docs_rel: str, threshold: float = 0.9, df_cap: int | None = None
) -> str:
    cap_cte = (
        f""",
    sh AS (SELECT sh_all.* FROM sh_all
           JOIN (SELECT shingle FROM sh_all
                 GROUP BY 1 HAVING count(*) <= {df_cap}) ok USING (shingle))"""
        if df_cap is not None
        else ""
    )
    first = "sh_all" if df_cap is not None else "sh"
    return f"""
    WITH {first} AS ({SHINGLES_SQL.format(docs=docs_rel)}){cap_cte},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, round(n_common / sa.n_sh, 4) AS containment
    FROM common JOIN sizes sa ON sa.doc_id = doc_a
    WHERE sa.n_sh >= {CONTAIN_MIN_SHINGLES}
      AND round(n_common / sa.n_sh, 4) >= {threshold}
    """


# ---------------------------------------------------------------------------
# PPJoin-style prefix-filtered similarity join (Xiao, Wang, Lin &
# Yu, WWW 2008) — the database-literature EXACT-RECALL alternative to
# LSH banding: order each doc's shingle set by ascending global
# document frequency (rarest first, shingle text as the
# deterministic tie), take the first |x| - ceil(t|x|) + 1 tokens as
# the PREFIX, and join only docs sharing a prefix token. The prefix-
# filter theorem guarantees every pair with Jaccard >= t shares at
# least one prefix token, so unlike MinHash/SimHash this candidate
# generation misses NOTHING — and the DuckDB oracle is the plain
# brute-force join, so the gate passes only if the theorem is
# honored by the implementation. Thresholds are integer fractions
# (num/den) end to end: prefix length uses ceil(num*n/den) =
# (num*n + den - 1) div den and the verify is den*common >=
# num*union — no doubles anywhere (the cross-engine float rule).
#
# Scale shape: df counting is one map-side-combinable groupBy on
# shingle; per-doc ordering is a local sort_array inside one groupBy
# on doc_id (no global window); prefixes are a few tokens per doc, so
# the candidate equi-join touches a small fraction of the shingle
# relation, and exact verification joins shingles for candidate pairs
# only. Rare-first ordering makes hot shingles structurally unlikely
# in prefixes — the skew story LSH needs a DF cap for comes built in.
# ---------------------------------------------------------------------------


def ppjoin_pairs(docs: DataFrame, num: int = 4, den: int = 5) -> DataFrame:
    """(doc_a, doc_b, n_common, n_union) for all pairs with shingle
    Jaccard >= num/den, found via prefix filtering (exact recall)."""
    sh = shingles(docs).persist()
    df_rel = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(df_rel, "shingle")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("df", "shingle"))
            ).alias("ord"),
            F.count("*").alias("n"),
        )
    )
    # prefix length p = n - ceil(num*n/den) + 1, all-integer
    p = (
        F.col("n")
        - F.expr(f"(n * {num} + {den} - 1) div {den}")
        + 1
    ).cast("int")
    prefixes = per_doc.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(F.col("ord"), 1, p), lambda s: s["shingle"]
            )
        ).alias("shingle"),
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    cands = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    common = (
        cands.join(sh.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sh.alias("sb"),
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.shingle") == F.col("sa.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("long").alias("n_common"),
            (F.col("na") + F.col("nb") - F.col("n_common"))
            .cast("long")
            .alias("n_union"),
        )
        .filter(F.col("n_common") * den >= F.col("n_union") * num)
    )


def ppjoin_pairs_sql(docs_rel: str, num: int = 4, den: int = 5) -> str:
    """Brute-force oracle — NO prefix filter: every pair with
    den*common >= num*union. The engine passes only if its prefix
    filter really has exact recall."""
    return f"""
    WITH sh AS ({SHINGLES_SQL.format(docs=docs_rel)}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(sa.n_sh + sb.n_sh - n_common AS BIGINT) AS n_union
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common * {den} >= (sa.n_sh + sb.n_sh - n_common) * {num}
    ORDER BY doc_a, doc_b
    """


# ---------------------------------------------------- suffix ranking


def suffix_ranks(
    docs: DataFrame, trunc: int = 200, width: int = 64
) -> DataFrame:
    """Suffix ranking by prefix doubling (Manber & Myers, "Suffix
    arrays: a new method for on-line string searches", SODA 1990) —
    the construction under suffix-array exact-substring dedup (Lee et
    al. 2022, the ExactSubstr pass whose SPAN extraction lives in
    :func:`substring_spans`). Each doc's suffixes are ranked by their
    first ``width`` characters: start from single-character dense
    ranks, then double the compared prefix per pass by re-ranking on
    the integer pair ``(rank[pos], rank[pos + 2^i])`` — positions
    past the end carry a -1 sentinel, so a shorter suffix sorts
    before every extension, exactly SQL string order.

    The 100 TB point of doubling over direct sorting: keys stay TWO
    integers per pass instead of ``width``-byte strings, and all
    log2(width) passes share ONE hash shuffle on doc_id — each
    ``lead`` and ``dense_rank`` window re-sorts in place within the
    same partitioning (AQE plans a single Exchange), so the whole
    construction is one shuffle + O(log width) in-partition sorts.

    Returns (doc_id, pos, rank64) with dense ranks per doc.
    """
    from pyspark.sql import Window

    s = docs.select("doc_id", F.substring("text", 1, trunc).alias("s"))
    sx = s.select(
        "doc_id",
        F.explode(F.expr("sequence(0, length(s) - 1)")).alias("p"),
        "s",
    )
    w0 = Window.partitionBy("doc_id").orderBy(F.expr("substr(s, p + 1, 1)"))
    df = sx.select(
        "doc_id",
        F.col("p").cast("long").alias("pos"),
        F.dense_rank().over(w0).cast("long").alias("r"),
    )
    w_pos = Window.partitionBy("doc_id").orderBy("pos")
    off = 1
    while off < width:
        w_rank = Window.partitionBy("doc_id").orderBy("r", "r2")
        df = (
            df.withColumn(
                "r2", F.coalesce(F.lead("r", off).over(w_pos), F.lit(-1))
            )
            .withColumn("nr", F.dense_rank().over(w_rank).cast("long"))
            .select("doc_id", "pos", F.col("nr").alias("r"))
        )
        off *= 2
    return df.select("doc_id", "pos", F.col("r").alias("rank64"))


def suffix_ranks_sql(
    docs_sql: str, trunc: int = 200, width: int = 64
) -> str:
    """DuckDB mirror — the DEFINITION the doubling must reproduce: a
    dense rank over the literal ``width``-char suffix prefix (binary
    collation both engines; a doubling bug that compares one byte too
    few or mishandles the end sentinel fails the hash)."""
    return f"""
    WITH d AS (SELECT doc_id, substr(text, 1, {trunc}) AS s
               FROM ({docs_sql})),
    px AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos, s
           FROM d, unnest(range(length(s))) AS u(i))
    SELECT doc_id, pos,
           CAST(dense_rank() OVER (
                PARTITION BY doc_id
                ORDER BY substr(s, CAST(pos AS INT) + 1, {width})
           ) AS BIGINT) AS rank64
    FROM px
    """


# ---------------------------------------------------------------------------
# weighted Jaccard over term-frequency vectors
# ---------------------------------------------------------------------------


def token_tf(docs: DataFrame) -> DataFrame:
    """(doc_id, token, tf) — per-doc word-3-gram shingle frequencies
    (integer multiplicities).

    The MULTISET companion of :func:`shingles`: same 3-gram universe
    (so the equi-join fan-out stays as small as the set arms'), but
    repetition is kept — a doc that repeats one paragraph 10x is NOT
    ~1.0-similar to the single copy under the weighted Jaccard below,
    which is exactly the spam-mirror failure mode a set-based pass
    lets through. Unigram tf was rejected here by measurement: every
    doc pair shares stopwords, so the token equi-join degenerates
    toward all-pairs (55 s at sf0.001); 3-gram keys keep candidate
    generation sparse.
    """
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("toks") - SHINGLE_K, F.lit(0)),
                ),
                lambda i: F.array_join(F.slice("toks", i + 1, SHINGLE_K), " "),
            )
        ).alias("token"),
    )
    return sh.groupBy("doc_id", "token").agg(
        F.count("*").cast("bigint").alias("tf")
    )


TOKEN_TF_SQL = """
    SELECT doc_id, array_to_string(toks[i + 1 : i + 3], ' ') AS token,
           CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\\s+') AS toks
          FROM {docs}),
         UNNEST(range(0, greatest(len(toks) - 3, 0) + 1)) AS t(i)
    GROUP BY 1, 2
"""


def weighted_jaccard_pairs(
    tf: DataFrame, threshold: float = 0.5, df_cap: int | None = None
) -> DataFrame:
    """All doc pairs with weighted (multiset) Jaccard >= threshold.

    J_w(A,B) = sum_t min(tf_A(t), tf_B(t)) / sum_t max(tf_A(t), tf_B(t))
    with the denominator computed as wa + wb - w_common — every term
    is an INTEGER sum, so the ratio is bit-stable cross-engine before
    the final round. Same scale shape as :func:`jaccard_pairs`: a
    broadcast anti-join df-cap bounds the hot-token self-join fan-out
    (sizes and intersections both over the capped universe), the tf
    relation is persisted once (referenced three times), and only
    candidate pairs sharing >= one surviving token are scored — never
    all-pairs.
    """
    if df_cap is not None:
        hot = (
            tf.groupBy("token")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > df_cap)
            .select("token")
        )
        tf = tf.join(F.broadcast(hot), "token", "left_anti")
    tf = tf.persist()
    weights = tf.groupBy("doc_id").agg(F.sum("tf").alias("w"))
    a = tf.alias("a")
    b = tf.alias("b")
    common = (
        a.join(b, F.col("a.token") == F.col("b.token"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.least("a.tf", "b.tf")).alias("w_common"))
    )
    wa = weights.select(F.col("doc_id").alias("doc_a"), F.col("w").alias("wa"))
    wb = weights.select(F.col("doc_id").alias("doc_b"), F.col("w").alias("wb"))
    return (
        common.join(wa, "doc_a")
        .join(wb, "doc_b")
        .withColumn(
            "wjaccard",
            F.round(
                F.col("w_common")
                / (F.col("wa") + F.col("wb") - F.col("w_common")),
                4,
            ),
        )
        .filter(F.col("wjaccard") >= threshold)
        .select(
            "doc_a", "doc_b",
            F.col("w_common").cast("bigint").alias("w_common"),
            "wjaccard",
        )
    )


def weighted_jaccard_pairs_sql(
    docs_rel: str, threshold: float, df_cap: int | None = None
) -> str:
    cap_cte = (
        f""",
    tf AS (SELECT tf_all.* FROM tf_all
           JOIN (SELECT token FROM tf_all
                 GROUP BY 1 HAVING count(*) <= {df_cap}) ok USING (token))"""
        if df_cap is not None
        else ""
    )
    first = "tf_all" if df_cap is not None else "tf"
    return f"""
    WITH {first} AS ({TOKEN_TF_SQL.format(docs=docs_rel)}){cap_cte},
    weights AS (SELECT doc_id, sum(tf) AS w FROM tf GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             sum(least(a.tf, b.tf)) AS w_common
      FROM tf a JOIN tf b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, CAST(w_common AS BIGINT) AS w_common,
           round(w_common / (sa.w + sb.w - w_common), 4) AS wjaccard
    FROM common
    JOIN weights sa ON sa.doc_id = doc_a
    JOIN weights sb ON sb.doc_id = doc_b
    WHERE round(w_common / (sa.w + sb.w - w_common), 4) >= {threshold}
    """
