"""Text-analysis + deduplication operators over the ``documents`` table —
the training-data-pipeline layer (SURVEY.md §2.10).

All of these stay in whole-stage codegen: tokenization, shingling,
fingerprinting and Jaccard are pure built-in expressions (split /
transform / md5 / joins) — no Python in the hot path. The approximate
variants (MinHash-LSH, SimHash) live in
``clockpipe_spark.operators.neardup`` and are surfaced in
queries_nosql.py-style rows-only entries because their hash families are
engine-specific (no DuckDB twin).

Scale notes (100 TB): exact-pair Jaccard is quadratic in the worst case —
the inverted-index join on shingles keeps it output-bound (only docs
*sharing* a shingle pair up), which holds as long as no shingle is an
outlier hot key; stop-shingle removal / MinHash-LSH is the designed scale
path and implemented alongside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table

# tokenization shared by every operator here: lower, trim, split on runs of
# whitespace. Kept identical in the DuckDB oracles.
def _tokens(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_STOP_SQL = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per language: doc count, token sum/avg."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.size(_tokens(F.col("text"))).alias("n_tokens"))
    # avg of int/int is a structured ratio: round() ties flip between
    # engines (Spark rounds the shortest decimal repr, DuckDB the binary
    # value), so emit floor(x*1e4) instead. DuckDB sum(int) is HUGEINT —
    # cast to BIGINT in the oracle.
    return toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.floor(F.avg("n_tokens") * 1e4).alias("avg_tokens"),
    )


TOKEN_STATS_SQL = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\\s+'))) AS BIGINT)
           AS total_tokens,
       CAST(floor(avg(len(regexp_split_to_array(trim(lower(text)), '\\s+'))) * 10000)
           AS BIGINT) AS avg_tokens
FROM documents GROUP BY lang
"""


def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics: token count, mean token length,
    alpha ratio, stopword ratio — the standard LLM-corpus quality gates."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize tokens/counters once (the split would otherwise be
    # re-evaluated per referencing expression)
    staged = docs.select(
        "doc_id",
        F.length(F.col("text")).alias("n_chars"),
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).alias("alpha"),
        _tokens(F.col("text")).alias("toks"),
    ).select(
        "doc_id",
        "n_chars",
        "alpha",
        F.size("toks").alias("n_tokens"),
        F.size(F.filter(F.col("toks"), lambda t: t.isin(*_STOPWORDS))).alias("stops"),
    )
    n_tokens, n_chars = F.col("n_tokens"), F.col("n_chars")
    stops, alpha = F.col("stops"), F.col("alpha")
    # int/int ratios floor-scaled to 1e4 integers: structured quotients
    # (denominator a power-of-2 multiple) land exactly on round() ties,
    # which Spark (shortest-repr HALF_UP) and DuckDB (binary half-away)
    # resolve differently. floor of identical IEEE quotients is exact.
    return staged.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.floor(alpha / n_chars * 1e4).alias("alpha_ratio"),
        F.floor(stops / n_tokens * 1e4).alias("stopword_ratio"),
        F.floor((n_chars - n_tokens + 1) / n_tokens * 1e4).alias("avg_token_len"),
        ((n_tokens >= 5) & (stops / n_tokens >= 0.01)).alias("passes_quality"),
    )


QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       CAST(floor(alpha / n_chars * 10000) AS BIGINT) AS alpha_ratio,
       CAST(floor(len(list_filter(toks, x -> x IN {_STOP_SQL})) / len(toks) * 10000)
           AS BIGINT) AS stopword_ratio,
       CAST(floor((n_chars - len(toks) + 1) / len(toks) * 10000) AS BIGINT)
           AS avg_token_len,
       (len(toks) >= 5 AND
        len(list_filter(toks, x -> x IN {_STOP_SQL})) / len(toks) >= 0.01)
           AS passes_quality
FROM t
"""


_LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "ist", "das"),
}


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: count marker-word hits per language, argmax
    with fixed precedence (en > es > de). N-gram/stopword heuristic — the
    standard cheap lang-ID for corpus triage."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")

    def marker_hits(markers):
        # single-arg lambda: PySpark treats 2-arg lambdas as (value, index)
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    hits = {lang: marker_hits(markers) for lang, markers in _LANG_MARKERS.items()}
    pred = (
        F.when((hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"]), "en")
        .when(hits["es"] >= hits["de"], "es")
        .otherwise("de")
    )
    return docs.select(
        "doc_id",
        hits["en"].alias("en_hits"),
        hits["es"].alias("es_hits"),
        hits["de"].alias("de_hits"),
        pred.alias("pred_lang"),
    )


def _marker_sql(markers):
    return "(" + ", ".join(f"'{m}'" for m in markers) + ")"


LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents
), h AS (
  SELECT doc_id,
         len(list_filter(toks, x -> x IN {_marker_sql(_LANG_MARKERS['en'])})) AS en_hits,
         len(list_filter(toks, x -> x IN {_marker_sql(_LANG_MARKERS['es'])})) AS es_hits,
         len(list_filter(toks, x -> x IN {_marker_sql(_LANG_MARKERS['de'])})) AS de_hits
  FROM t
)
SELECT doc_id, en_hits, es_hits, de_hits,
       CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
            WHEN es_hits >= de_hits THEN 'es'
            ELSE 'de' END AS pred_lang
FROM h
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-text md5 over normalized text plus a
    coarse length bucket — the exact-dedup key."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        (F.length(norm) - F.length(norm) % 16).alias("len_bucket"),
    )


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(lower(trim(text))) AS fingerprint,
       length(lower(trim(text))) - length(lower(trim(text))) % 16 AS len_bucket
FROM documents
"""


# duplicated corpus: every doc appears twice (ids offset by 1_000_000) so
# dedup operators have true positives to find. Shared with the oracles.
_DOUBLED_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text FROM documents
"""


def _doubled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clockpipe_spark.operators.fanout import fanout_repartition

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    clone = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    # every consumer feeds a compute-heavy stage (minhash/simhash
    # signatures, shingle explode); off single-file inputs those would
    # inherit 2 partitions (VERDICT r4 fan-out class)
    return fanout_repartition(docs.unionByName(clone))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at scale: hash-groupBy on the md5 fingerprint, keep the
    lowest doc_id of each group. One shuffle on a 128-bit key — the
    canonical 100 TB exact-dedup plan (never a pairwise self-join).

    Fingerprint-FIRST, then double: md5 runs map-side at scan
    parallelism and the only shuffle (the groupBy) moves (fp, doc_id)
    pairs, never document text.  The shared ``_doubled_corpus`` helper
    deliberately stays out of this plan: its round-robin
    ``fanout_repartition`` exists to feed compute-heavy fan-out stages
    (shingle explode, signature matmuls) and here would add a full-text
    shuffle in front of a trivial projection — the r6-r8 watch-item
    drift on this query (0.25 s -> 0.6-0.7 s) was exactly that."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp0 = docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    )
    fp = fp0.unionByName(
        fp0.select((F.col("doc_id") + 1000000).alias("doc_id"), "fp")
    )
    return fp.groupBy("fp").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").alias("n_copies"),
    )


DEDUP_EXACT_SQL = f"""
WITH corpus AS ({_DOUBLED_SQL})
SELECT md5(lower(trim(text))) AS fp,
       min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies
FROM corpus GROUP BY 1
"""


_SHINGLE_K = 3
_JACCARD_THRESHOLD = 0.5


def _jaccard_baseline_from_toks(toks: DataFrame) -> DataFrame:
    """Inverted-index exact-Jaccard plan over a (doc_id, toks) frame —
    the body shared by neardup_jaccard_pairs and the adaptive
    dispatcher's benign-corpus arm."""
    from clockpipe_spark.operators.neardup import shingles_from_tokens

    sh = toks.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("toks"), _SHINGLE_K)).alias("shingle"),
    # r15 (the bigram lesson, self-join variant): the two self-join
    # sides already share one expansion via ReuseExchange (identical
    # subtrees, same shingle partitioning), but the sizes branch prunes
    # differently and re-ran the interpreted shingle concat. One
    # checkpoint feeds all three consumers (A/B at sf0.1: warm
    # 1.77-1.99 -> 1.63-1.92, cold 9.2 -> 3.2 s).
    ).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") / (
        F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_common")
    )
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= _JACCARD_THRESHOLD)
        # floor-scaled: jaccard is an int/int ratio; round() ties (e.g.
        # 17/32 = 0.53125) flip between engines — see text_quality_scores.
        .select("doc_a", "doc_b", F.floor(jac * 1e4).alias("jaccard"))
    )


def neardup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join:
    explode distinct shingles, self-join on shingle (only co-occurring
    docs meet), count intersections, Jaccard from |A|+|B|-|A∩B|.

    Output-bound instead of O(n²): cost scales with shingle co-occurrence,
    not corpus size squared. Tokens are materialized as a column before
    shingling (see operators.neardup.shingles_from_tokens: inline split()
    inside a lambda re-tokenizes per element)."""
    corpus = _doubled_corpus(spark, sf_dir)
    toks = corpus.select("doc_id", _tokens(F.col("text")).alias("toks"))
    return _jaccard_baseline_from_toks(toks)


NEARDUP_JACCARD_SQL = f"""
WITH corpus AS ({_DOUBLED_SQL}),
tok AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM corpus
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(toks) >= {_SHINGLE_K}
                THEN list_transform(
                       generate_series(1, len(toks) - {_SHINGLE_K - 1}),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                ELSE [] END)) AS shingle
  FROM tok
),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(floor(n_common / (sa.n_shingles + sb.n_shingles - n_common) * 10000)
           AS BIGINT) AS jaccard
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_common / (sa.n_shingles + sb.n_shingles - n_common) >= {_JACCARD_THRESHOLD}
"""


def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters + canonical doc: connected components over the
    exact-Jaccard pair graph, cluster_id = smallest doc_id in the
    component, is_canonical marks the one doc a dedup pass would keep.

    The component step is iterative min-label propagation
    (operators/components.py — O(diameter) rounds, two shuffle joins
    per round); the pair graph here is the exact oracle baseline, so
    the oracle below can mirror it with a recursive CTE. At 100 TB the
    edge input swaps to the LSH pair miner (dedup_minhash_lsh) with the
    component step unchanged."""
    from clockpipe_spark.operators.components import connected_components

    corpus = _doubled_corpus(spark, sf_dir).select("doc_id")
    pairs = neardup_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(
        corpus, pairs, id_col="doc_id", src="doc_a", dst="doc_b"
    )
    # no final orderBy (r15): cosmetic on a corpus-level output — the
    # gate hash-compares canonically row-sorted frames, and a global
    # sort's range-sampling pass re-executes the un-checkpointed tail
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        (F.col("id") == F.col("lbl")).alias("is_canonical"),
    )


DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE
raw_edges AS (
  SELECT doc_a AS a, doc_b AS b FROM ({NEARDUP_JACCARD_SQL})
),
edges AS (
  SELECT a, b FROM raw_edges UNION SELECT b, a FROM raw_edges
),
nodes AS (
  SELECT doc_id FROM ({_DOUBLED_SQL})
),
reach AS (
  SELECT doc_id AS id, doc_id AS lbl FROM nodes
  UNION
  SELECT e.a AS id, r.lbl FROM edges e JOIN reach r ON e.b = r.id
)
SELECT id AS doc_id,
       min(lbl) AS cluster_id,
       (min(lbl) = id) AS is_canonical
FROM reach
GROUP BY id
"""


_SPLIT_HASH_MULT = 2654435761  # Knuth multiplicative hash, engine-portable
_SPLIT_HASH_MOD = 4294967296


def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split is a deterministic
    hash of the document's near-dup CLUSTER id, not the doc id — so
    near-duplicates can never straddle splits (the classic eval-leak in
    training corpora: a val doc whose near-copy sits in train). 90/5/5
    via a Knuth multiplicative hash, chosen over xxhash/md5 because both
    engines compute identical bigint arithmetic (portable oracle).

    Composes the dedup pipeline's cluster assignment (exact-Jaccard
    pairs -> connected components) with the split rule; at 100 TB the
    edge input swaps to the LSH miner exactly as in
    dedup_cluster_assign_lsh, leaving the split rule untouched."""
    labels = dedup_cluster_assign(spark, sf_dir).select("doc_id", "cluster_id")
    hv = F.pmod(
        F.col("cluster_id") * F.lit(_SPLIT_HASH_MULT), F.lit(_SPLIT_HASH_MOD)
    ) % 100
    return (
        labels.withColumn("hv", hv)
        .select(
            "doc_id",
            "cluster_id",
            F.when(F.col("hv") < 90, "train")
            .when(F.col("hv") < 95, "val")
            .otherwise("test")
            .alias("split"),
        )
        # no final orderBy (r15): cosmetic, see dedup_cluster_assign
    )


SPLIT_LEAKAGE_SQL = f"""
WITH clusters AS ({DEDUP_CLUSTER_SQL})
SELECT doc_id, cluster_id,
       CASE WHEN hv < 90 THEN 'train'
            WHEN hv < 95 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, cluster_id,
         ((cluster_id * {_SPLIT_HASH_MULT}) % {_SPLIT_HASH_MOD}) % 100 AS hv
  FROM clusters
)
"""


_CLUSTER_CAP = 2


def sample_cluster_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted dedup: keep at most N docs per near-dup cluster
    (deterministic — lowest doc_ids win) instead of collapsing to one
    canonical doc. The standard middle ground when exact copies should
    go but bounded near-dup diversity is wanted in the training mix;
    one extra window over the cluster assignment, shuffle-partitioned
    by cluster id."""
    from pyspark.sql import Window

    labels = dedup_cluster_assign(spark, sf_dir).select("doc_id", "cluster_id")
    w = Window.partitionBy("cluster_id").orderBy("doc_id")
    return (
        labels.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CLUSTER_CAP)
        .select("doc_id", "cluster_id", F.col("rn").alias("keep_rank"))
        # no final orderBy (r15): the range-sampler re-ran the window
        # shuffle a second time; cosmetic, see dedup_cluster_assign
    )


SAMPLE_CLUSTER_CAP_SQL = f"""
WITH clusters AS ({DEDUP_CLUSTER_SQL})
SELECT doc_id, cluster_id, keep_rank FROM (
  SELECT doc_id, cluster_id,
         row_number() OVER (PARTITION BY cluster_id ORDER BY doc_id)
             AS keep_rank
  FROM clusters
) WHERE keep_rank <= {_CLUSTER_CAP}
ORDER BY doc_id
"""


_CHAIN_LEN = 128


def dedup_components_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial long-chain component graph: documents linked into
    chains of _CHAIN_LEN consecutive row_numbers, resolved by
    alternating large-star/small-star contraction
    (operators/components.py:129 — Kiveris et al., O(log n) rounds on
    ANY shape). Naive min-label propagation moves the min ONE hop per
    round, so a 128-long chain blows its 25-round budget and raises
    ComponentsDidNotConverge — pinned in tests/test_components.py. This
    is the gate evidence for the O(log n) claim: the oracle derives each
    component's min analytically from the chain arithmetic, so a green
    hash means star contraction found exactly the right components on a
    graph naive propagation cannot finish.

    The global row_number window below is FIXTURE CONSTRUCTION (building
    a worst-case graph from testdata), not the operator under test; the
    contraction itself is all groupBy-min + equi-join per round."""
    from pyspark.sql import Window

    from clockpipe_spark.operators.components import connected_components_star

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    rn = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id")) - 1
    ).localCheckpoint(eager=True)
    nxt = rn.select(F.col("doc_id").alias("dst"), F.col("rn").alias("rn_next"))
    edges = (
        rn.filter((F.col("rn") % _CHAIN_LEN) != _CHAIN_LEN - 1)
        .withColumn("rn_next", F.col("rn") + F.lit(1))
        .join(nxt, "rn_next")
        .select(F.col("doc_id").alias("src"), "dst")
    )
    labels = connected_components_star(
        docs, edges, id_col="doc_id", src="src", dst="dst",
        # each src appears once (row_number join) — skip the edge-dedup
        # shuffle (r15)
        edges_distinct=True,
    )
    # no final orderBy (r15): cosmetic, see dedup_cluster_assign
    return labels.select(
        F.col("id").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


COMPONENTS_CHAIN_SQL = f"""
WITH rn AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rn
  FROM documents
)
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY rn // {_CHAIN_LEN}) AS cluster_id
FROM rn ORDER BY doc_id
"""


# Plan switch for the exact-Jaccard join (VERDICT r9 directive #5 /
# r10 #4): the baseline inverted-index join produces sum(df*(df-1)/2)
# candidate rows — its AMPLIFICATION over the gram mass (sum df) is ~1
# on curated corpora but grows linearly in df for every hot template
# gram. Threshold calibration, measured on this host at sf0.1 (amp
# 10.2: gram_mass 521k, cand 5.3M): baseline 1.86 s vs prefix 11.7 s —
# even at 10 extra join rows per gram row the codegen'd join+agg beats
# the prefix arm's fixed machinery (df join, per-doc canonical
# collect_list sort, pair-level array_intersect verifies) by 6x. A
# per-unit cost model from those points puts indifference near amp ~65;
# 32 splits the regimes with margin BOTH ways (this corpus keeps 3x
# headroom to baseline; a genuine template — df in the thousands —
# lands orders of magnitude above) and deliberately biases toward the
# robust plan at scale: on 1000 executors an unbounded df^2 join blowup
# is a job-killer, a ~6x bounded fixed cost is not.
_PREFIX_MAX_AMPLIFICATION = 32.0


def gram_df_profile(toks: DataFrame) -> dict:
    """One bounded probe over the inverted index: total gram mass,
    exact baseline-join candidate rows (sum df*(df-1)/2), and the max
    document frequency. Map-side-combinable aggregation, 1-row result
    — the 100 TB cost is one pass over the gram explode, paid once to
    avoid running a plan whose join volume is quadratic in the hottest
    template's df."""
    from clockpipe_spark.operators.neardup import shingles_from_tokens

    sh = toks.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("toks"), _SHINGLE_K)).alias("shingle"),
    )
    row = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .agg(
            F.sum("df").alias("gram_mass"),
            F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("cand_rows"),
            F.max("df").alias("max_df"),
        )
        .first()
    )
    gram_mass = row["gram_mass"] or 0
    cand_rows = float(row["cand_rows"] or 0.0)
    return {
        "gram_mass": gram_mass,
        "cand_rows": cand_rows,
        "max_df": row["max_df"] or 0,
        "amplification": cand_rows / gram_mass if gram_mass else 0.0,
    }


def choose_jaccard_plan(profile: dict) -> str:
    """'baseline' unless the probe shows the inverted-index join would
    amplify past _PREFIX_MAX_AMPLIFICATION rows per input gram row."""
    return (
        "prefix"
        if profile["amplification"] > _PREFIX_MAX_AMPLIFICATION
        else "baseline"
    )


def neardup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs — SAME semantics and oracle
    as neardup_jaccard_pairs, chosen ADAPTIVELY per corpus df profile
    (r11, closing the r9 crossover directive): a one-row probe over the
    inverted index (gram_df_profile) measures how much the baseline's
    gram self-join would amplify, and dispatches:

    - amplification <= 32: the plain inverted-index join (this corpus:
      amplification 10.2, baseline 1.86 s vs prefix 11.7 s at sf0.1);
    - amplification > 32: PPJoin-style prefix filtering (Chaudhuri et
      al. SSJoin / Xiao et al. PPJoin): under a global df-ascending
      canonical gram order, any pair with J >= tau must share a gram
      inside each side's first |A| - ceil(tau/(1+tau)*|A|) + 1 grams,
      so candidates come from joining only the RARE prefix grams — the
      hot template shingles that explode the baseline's join volume
      (sum df^2) never enter it. Survivors verify exactly via
      array_intersect on staged per-doc gram arrays.

    The switch flipping on a hot-template fixture is pinned in
    tests/test_textops_prefix.py; both arms share the one DuckDB
    oracle (the plain inverted-index replay), so a dispatch or
    filtering bug on either arm would hash-fail at the gate."""
    corpus = _doubled_corpus(spark, sf_dir)
    toks = corpus.select("doc_id", _tokens(F.col("text")).alias("toks"))
    if choose_jaccard_plan(gram_df_profile(toks)) == "baseline":
        return _jaccard_baseline_from_toks(toks)
    return _jaccard_prefix_from_toks(toks)


def _jaccard_prefix_from_toks(toks: DataFrame) -> DataFrame:
    """The PPJoin-style prefix-filtered arm (see neardup_jaccard_prefix
    for the dispatch rule and citations). The prefix bound uses
    tau/(1+tau) (valid for any |B|), conservative by construction."""
    from clockpipe_spark.operators.neardup import shingles_from_tokens

    docs_sh = toks.select(
        "doc_id", shingles_from_tokens(F.col("toks"), _SHINGLE_K).alias("sh")
    )
    exploded = docs_sh.select("doc_id", F.explode("sh").alias("shingle"))
    df_tbl = exploded.groupBy("shingle").agg(F.count("*").alias("df"))
    # per-doc grams in (df asc, shingle asc) canonical order, then the
    # prefix slice; p = |A| - ceil(tau/(1+tau)|A|) + 1 with tau = 1/2
    # -> ceil(|A|/3) done in exact ints as (|A| + 2) div 3
    ordered = (
        exploded.join(df_tbl, "shingle")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df", "shingle"))),
                lambda s: s["shingle"],
            ).alias("ordered_sh")
        )
        .select(
            "doc_id",
            F.expr(
                "slice(ordered_sh, 1,"
                " size(ordered_sh) - (size(ordered_sh) + 2) div 3 + 1)"
            ).alias("prefix_sh"),
        )
    )
    pre = ordered.select(
        "doc_id", F.explode("prefix_sh").alias("shingle")
    )
    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = docs_sh.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    sb = docs_sh.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_common"),
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
        )
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return verified.filter(jac >= _JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.floor(jac * 1e4).alias("jaccard")
    )


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_quality_scores": text_quality_scores,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "dedup_exact": dedup_exact,
    "neardup_jaccard_pairs": neardup_jaccard_pairs,
    "neardup_jaccard_prefix": neardup_jaccard_prefix,
    "dedup_cluster_assign": dedup_cluster_assign,
    "dedup_components_chain": dedup_components_chain,
    "split_leakage_safe": split_leakage_safe,
    "sample_cluster_cap": sample_cluster_cap,
}

ORACLES = {
    "dedup_components_chain": COMPONENTS_CHAIN_SQL,
    "split_leakage_safe": SPLIT_LEAKAGE_SQL,
    "sample_cluster_cap": SAMPLE_CLUSTER_CAP_SQL,
    "text_token_stats": TOKEN_STATS_SQL,
    "text_quality_scores": QUALITY_SQL,
    "text_lang_id": LANG_ID_SQL,
    "text_fingerprint": FINGERPRINT_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "neardup_jaccard_pairs": NEARDUP_JACCARD_SQL,
    # same semantics, same oracle — the prefix-filtered plan must
    # reproduce the baseline bit-for-bit
    "neardup_jaccard_prefix": NEARDUP_JACCARD_SQL,
    "dedup_cluster_assign": DEDUP_CLUSTER_SQL,
}
