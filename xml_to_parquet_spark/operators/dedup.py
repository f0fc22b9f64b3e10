"""Deduplication operators [EXT] — exact, normalized, MinHash-LSH, SimHash,
n-gram Jaccard (SURVEY.md §2.2, north-star LLM-pipeline surface).

Every variant is deterministic and md5-based so the DuckDB oracle can
reproduce values exactly — including the MinHash signatures (one md5 per
shingle decoded to an integer, then affine mixes: identical 64-bit
arithmetic in both engines).

Scale design: near-dup never goes O(n²) on the full corpus — LSH banding
(minhash) and bucket blocking (simhash) turn candidate generation into an
equi-join on (band, hash) / (bucket) keys, i.e. a single shuffle whose
width is the collision count, not n². The only quadratic step left is
inside buckets, which is the algorithm's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from xml_to_parquet_spark.functions.text_fns import (
    TOKENS_DUCK,
    TOKENS_SQL,
    shingles_duck,
    shingles_sql,
)
from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.tables import table
from xml_to_parquet_spark.materialize import materialize

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup = hash-groupBy: one shuffle on the 128-bit digest, the
    canonical 100 TB dedup pass (hash is computed map-side; the exchange
    carries digests, not documents)."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dedup_normalized",
    """
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g'))) AS norm_hash,
           min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_normalized(spark, sf_dir):
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.md5(norm).alias("norm_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


# One md5 per shingle → 64-bit value → NUM_HASHES derived hashes by
# affine integer mixing (a_j·v + b_j mod M). Measured ~2.5× cheaper than
# hashing every shingle NUM_HASHES times (md5 dominates; the mixes are
# codegen'd multiply-mods). Constants: distinct odd multipliers, Mersenne
# prime modulus.
MIX_M = 2_147_483_647
MIX_A = [999_983 + 2 * j * 7919 for j in range(NUM_HASHES)]
MIX_B = [104_729 * (j + 1) for j in range(NUM_HASHES)]

# first 8 hex digits of md5 as an integer, engine-portably (no conv() in
# DuckDB): positional digit decode
def _hexval(md5_expr: str, instr_fn: str) -> str:
    # per-term BIGINT cast: the weighted sum reaches 2^32 and would
    # overflow 32-bit arithmetic (ANSI error in Spark 4) if left as int
    return " + ".join(
        f"CAST({instr_fn}('0123456789abcdef', substr({md5_expr}, {d + 1}, 1)) - 1 "
        f"AS BIGINT) * {16 ** (7 - d)}"
        for d in range(8)
    )


def _shingle_vals_spark() -> str:
    """shingles → one 64-bit value per shingle (single md5 pass)."""
    v = _hexval("md5(s)", "instr")
    return f"transform(shingles, s -> CAST({v} AS BIGINT))"


def _minhash_cols_spark() -> list:
    """vals → NUM_HASHES min-of-mix columns (no hashing here — vals is a
    materialized column, so md5 runs once per shingle total)."""
    return [
        F.expr(
            f"array_min(transform(vals, v -> "
            f"({MIX_A[j]} * v + {MIX_B[j]}) % {MIX_M}))"
        ).alias(f"m{j}")
        for j in range(NUM_HASHES)
    ]


def _band_cols_spark() -> list:
    cols = []
    for b in range(BANDS):
        parts = ", ".join(f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        cols.append(F.expr(f"md5(concat_ws('|', {parts}))").alias(f"b{b}"))
    return cols


def minhash_signatures(spark, sf_dir, where: str | None = None):
    """Per-doc MinHash signature: shingle → md5 value → 16 affine-mix
    min-hashes. All map-side (no shuffle); the heavy lifting is inside
    codegen'd higher-order functions. ``where`` (a SQL predicate over the
    documents columns) scopes the corpus slice — used by the incremental
    index to sign the index and batch sides separately.

    The input is repartitioned to the session parallelism first: hashing is
    CPU-bound and the documents table may arrive as few (or one) splits —
    without this, all signature work lands on a handful of cores. At real
    scale the read produces thousands of splits and the repartition is a
    cheap no-op-sized shuffle either way."""
    src_docs = table(spark, sf_dir, "documents")
    if where is not None:
        src_docs = src_docs.filter(where)
    docs = (
        src_docs
        .select("doc_id", F.expr(TOKENS_SQL).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return (
        docs.filter(F.size("toks") >= 3)
        .select("doc_id", F.expr(shingles_sql(3)).alias("shingles"))
        .select("doc_id", F.expr(_shingle_vals_spark()).alias("vals"))
        .select("doc_id", *_minhash_cols_spark())
    )


def _minhash_oracle() -> str:
    v = _hexval("md5(s)", "strpos")
    mcols = ",\n           ".join(
        f"list_min(list_transform(vals, v -> ({MIX_A[j]} * v + {MIX_B[j]}) % {MIX_M}))"
        f" AS m{j}"
        for j in range(NUM_HASHES)
    )
    band_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, md5({parts}) AS bh FROM sig".format(
            b=b,
            parts=" || '|' || ".join(
                f"CAST(m{b * ROWS_PER_BAND + r} AS VARCHAR)"
                for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
    ), sh AS (
      SELECT doc_id, {shingles_duck(3)} AS shingles FROM tok WHERE len(toks) >= 3
    ), vl AS (
      SELECT doc_id, list_transform(shingles, s -> CAST({v} AS BIGINT)) AS vals
      FROM sh
    ), sig AS (
      SELECT doc_id, {mcols} FROM vl
    ), bands AS (
      {band_rows}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.bh = b.bh
                             AND a.doc_id < b.doc_id
    """


@register("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup candidates: 16 hashes, 4 bands × 4 rows.
    Candidate pairs = docs sharing any band hash. The pair join is an
    equi-join on (band_id, band_hash) — shuffle width is the number of
    colliding docs, never n²."""
    sig = minhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id", F.posexplode(F.array(*_band_cols_spark())).alias("band_id", "bh")
    )
    # Bucket by (band, hash) and emit pairs inside each bucket with an array
    # expression — one shuffle, signatures computed once. (A self-join here
    # would recompute the full signature subtree for each side.)
    buckets = (
        bands.groupBy("band_id", "bh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), y -> "
                "struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


# ---------------------------------------------------------------------------
# SimHash (32-bit, Manku–Jain–Sarma banding, portable arithmetic bits)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # pigeonhole: hamming ≤ SIMHASH_BANDS-1 ⇒ ≥1 exact band
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
SIMHASH_MAX_HAMMING = 3


def _simhash_bits_spark() -> str:
    """Spark SQL expr computing the 32-bit simhash of array column `toks`.

    Bit (4*d+j) comes from hex digit d (of md5(token)) bit j; digit value
    via instr('0123456789abcdef', ...) - 1 — portable to DuckDB."""
    terms = []
    for d in range(SIMHASH_BITS // 4):  # one hex digit → 4 bits
        for j in range(4):
            bit = d * 4 + j
            dv = f"(instr('0123456789abcdef', substr(md5(t), {d + 1}, 1)) - 1)"
            b = f"(cast(floor({dv} / {2 ** j}) as int) % 2)"
            terms.append(
                f"(case when aggregate(toks, 0, (acc, t) -> acc + 2 * {b} - 1) > 0 "
                f"then {2 ** bit} else 0 end)"
            )
    return " + ".join(terms)


def _simhash_bits_duck() -> str:
    terms = []
    for d in range(SIMHASH_BITS // 4):
        for j in range(4):
            bit = d * 4 + j
            dv = f"(strpos('0123456789abcdef', substr(md5(t), {d + 1}, 1)) - 1)"
            b = f"(cast(floor({dv} / {2 ** j}) as int) % 2)"
            terms.append(
                f"(case when list_sum(list_transform(toks, t -> 2 * {b} - 1)) > 0 "
                f"then {2 ** bit} else 0 end)"
            )
    return " + ".join(terms)


def _simhash_oracle() -> str:
    band_size = 2 ** SIMHASH_BAND_BITS
    return f"""
    WITH tok AS (
      SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
    ), sh AS (
      SELECT doc_id, ({_simhash_bits_duck()})::BIGINT AS simhash FROM tok
    ), bands AS (
      SELECT doc_id, simhash, t.k AS band_idx,
             (simhash // CAST(power({band_size}, t.k) AS BIGINT)) % {band_size} AS band_val
      FROM sh, LATERAL unnest(range(0, {SIMHASH_BANDS})) AS t(k)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """


@register("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup with the Manku–Jain–Sarma banding scheme (the
    Google near-dup-crawl design): 32-bit fingerprint split into 4 bands
    of 8 bits; any pair within hamming distance 3 differs in at most 3
    bands, so by pigeonhole it agrees EXACTLY on at least one band —
    guaranteed recall, unlike top-nibble blocking (the round-1 design,
    whose 16 fixed buckets also grew linearly with the corpus and made
    candidate generation quadratic: 823k candidates from 5k docs at
    sf0.1; banding cut the surviving output 30×).

    Scale shape: candidate generation is an equi-join on (band_idx,
    band_val) — 4×2^8 keys here, 4×2^16 with a 64-bit hash — so bucket
    cardinality is a tunable constant and the verify filter (bit_count of
    xor ≤ 3) runs only on band-collision pairs. DISTINCT dedups pairs
    that collide on multiple bands before they reach downstream
    clustering."""
    band_size = 2 ** SIMHASH_BAND_BITS
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(TOKENS_SQL).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    sh = docs.select(
        "doc_id", F.expr(f"({_simhash_bits_spark()})").cast("bigint").alias("simhash")
    )
    # r16-opt (guide §2.4): the banded fingerprint table feeds BOTH
    # self-join sides, so the scan + tokenize + simhash bit fold (the
    # CPU-heavy part) ran twice as one lazy subtree (before-plan: 4
    # FileScans, the simhash expression duplicated). One localCheckpoint
    # of the (doc_id, simhash, band) rows — SIMHASH_BANDS small rows per
    # doc — computes the fingerprints exactly once.
    bands = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    ((F.col("simhash") / F.lit(band_size ** k)).cast("bigint"))
                    % band_size
                    for k in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    ).transform(materialize)
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH tok AS (
      SELECT doc_id, source, {TOKENS_DUCK} AS toks FROM documents
    ), sh0 AS (
      SELECT doc_id, source, unnest(list_distinct({shingles_duck(3)})) AS shingle
      FROM tok WHERE len(toks) >= 3
    ), hot AS (
      SELECT source, shingle FROM sh0 GROUP BY source, shingle
      HAVING count(*) > 100
    ), sh AS (
      SELECT s.* FROM sh0 s LEFT JOIN hot h USING (source, shingle)
      WHERE h.shingle IS NULL
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.source = b.source AND a.shingle = b.shingle
                         AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard, blocked by `source` so the shingle self-join
    stays partition-local (the blocking key is the scale lever: swap in an
    LSH band for open-domain corpora).

    Hot-shingle cap (the candidate-linearity bound): shingles appearing in
    more than MAX_DF=100 documents of the same source are dropped BEFORE
    both the size and intersection computations, so Jaccard is exact over
    the filtered shingle space on both engines. Without the cap a
    boilerplate shingle shared by d documents fans out into C(d,2)
    candidate pairs — quadratic in the hottest key; with it each shingle
    contributes ≤ C(100,2) pairs, making total candidates LINEAR in the
    number of distinct (source, shingle) keys. Near-universal shingles
    carry no dedup signal anyway (they are stopword boilerplate), so the
    cap is also a precision win. The hot set itself is tiny by
    construction (only df>100 keys), so the anti-join is left unhinted
    for AQE to broadcast.

    r16-opt (guide §2.4): the exploded shingle list fans into FOUR
    consumers (the hot-shingle aggregate, the per-doc sizes, and both
    self-join sides) and as a lazy subtree re-ran the scan + tokenize +
    shingle explode once per consumer (before-plan: 16 FileScans / 44
    Exchanges). The explode now materializes once; the anti-join stays
    ABOVE the checkpoint so the pinned hot-stoplist shape
    (test_ngram_jaccard_hot_shingle_anti_join's LeftAnti, unhinted)
    remains visible in the final plan. Results identical (oracle
    re-verified both SFs)."""
    max_df = 100
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "source", F.expr(TOKENS_SQL).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    sh0 = (
        docs.filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(F.expr(shingles_sql(3)))).alias("shingle"),
        )
        .transform(materialize)
    )
    hot = (
        sh0.groupBy("source", "shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("source", "shingle")
    )
    sh = sh0.join(hot, ["source", "shingle"], "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_inter") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# duplicate clusters: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def _components_oracle() -> str:
    pairs = _minhash_oracle()
    return f"""
    WITH pairs AS ({pairs}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), nodes AS (
      SELECT DISTINCT a AS node FROM edges
    ), reach AS (
      -- transitive closure by recursion; min reachable id = component label
      WITH RECURSIVE r(node, lab) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.lab FROM r JOIN edges e ON e.a = r.node
      )
      SELECT * FROM r
    )
    SELECT node AS doc_id, min(lab) AS component FROM reach GROUP BY node
    """


def connected_components(
    edges: DataFrame, *, pointer_jump: bool = True, max_rounds: int = 30
) -> DataFrame:
    """Connected components over a symmetric edge list (columns a, b) via
    iterative min-label propagation — the Pregel/GraphX pattern as plain
    DataFrame code. Returns (node, lab).

    Each round every node adopts the min label in its neighborhood. With
    ``pointer_jump`` each round additionally shortcuts label→label-of-label
    (one extra equi-join on the label table), which compresses long chains
    exponentially: convergence in O(log diameter) rounds instead of
    O(diameter), so ``max_rounds=30`` covers any graph a 100 TB corpus
    could produce (diameter up to ~2^30). Non-convergence RAISES instead of
    silently returning wrong labels.

    Scale shape per round: joins and aggs all keyed on node/label —
    co-partitioned after the first shuffle; label state lineage is cut per
    round (localCheckpoint), the standard guard against iterative-plan
    blowup. Convergence rides the SAME checkpoint: the round carries its
    old label through to a `changed` flag computed in the final
    projection, so the check is a filter + limit(1).count() over the
    already-materialized partitions — no per-round label-vs-label join
    (which re-shuffled both node-keyed tables just to ask "anything
    new?"). Pre-partitioning the loop inputs (edges by b once, labels by
    node per round) was MEASURED AND REJECTED: the extra edge-list
    materialization plus the per-round repartition cost ~+1s across all
    three consumers at sf0.1 — the exchanges they remove are smaller
    than the materializations they add at match-graph sizes. Dropping
    the jump join was ALSO measured (late r15, ER match graph at sf0.1,
    interleaved): pointer_jump=False reads ~0.3s faster there because
    that graph is star-shallow (same round count, one fewer join per
    round) — and REJECTED: the jump is what bounds rounds at
    O(log diameter) for graphs whose depth no caller can certify, and a
    0.3s local saving does not buy back a convergence guarantee."""
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "lab", F.col("node")
    )
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        new_labels = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("lab").alias("old_lab"),
            F.least(F.col("lab"), F.coalesce("nlab", F.col("lab"))).alias("lab"),
        )
        if pointer_jump:
            parent = new_labels.select(
                F.col("node").alias("p_node"), F.col("lab").alias("p_lab")
            )
            new_labels = new_labels.join(
                parent, new_labels.lab == parent.p_node, "left"
            ).select(
                "node",
                "old_lab",
                F.least(F.col("lab"), F.coalesce("p_lab", F.col("lab"))).alias("lab"),
            )
        new_labels = new_labels.select(
            "node", "lab", (F.col("lab") != F.col("old_lab")).alias("changed")
        ).transform(materialize)
        changed = new_labels.filter("changed").limit(1).count()
        labels = new_labels.select("node", "lab")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within {max_rounds} rounds; "
        "raise max_rounds (pointer_jump=True needs only log2(diameter) rounds)"
    )


@register("dedup_components", _components_oracle())
def dedup_components(spark, sf_dir):
    """Duplicate clusters from near-dup pairs: connected components via
    pointer-jumping min-label propagation (see ``connected_components``).
    The DuckDB oracle computes the same fixpoint by recursive transitive
    closure."""
    pairs = dedup_minhash_lsh(spark, sf_dir).transform(materialize)
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionAll(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .transform(materialize)
    )
    labels = connected_components(edges, pointer_jump=True, max_rounds=30)
    return labels.select(F.col("node").alias("doc_id"), F.col("lab").alias("component"))


def _minhash_verified_oracle() -> str:
    pairs = _minhash_oracle()
    return f"""
    WITH cand AS ({pairs}),
    tok2 AS (
      SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
    ), shset AS (
      SELECT doc_id, list_distinct({shingles_duck(3)}) AS sh
      FROM tok2 WHERE len(toks) >= 3
    )
    SELECT c.doc_a, c.doc_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
               AS jaccard
    FROM cand c JOIN shset a ON a.doc_id = c.doc_a
                JOIN shset b ON b.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
    """


@register("dedup_minhash_verified", _minhash_verified_oracle())
def dedup_minhash_verified(spark, sf_dir):
    """The complete two-stage near-dup pipeline: LSH banding proposes
    candidates (sub-quadratic), exact shingle-set Jaccard verifies them —
    false positives from band collisions are filtered at the cost of one
    join against the (distinct-)shingle sets of candidate docs only. This
    is the production shape: verification cost scales with |candidates|,
    never |corpus|².

    r16-opt (guide §2.4): the shingle-set table feeds BOTH sides of the
    verification join, so the scan + tokenize + shingle build (behind a
    round-robin exchange) ran twice as one lazy subtree — documents was
    scanned three times per query including the LSH stage (before-plan:
    6 FileScans). One localCheckpoint of the per-doc shingle sets makes
    it two passes: signatures and shingle sets, each built once."""
    cand = dedup_minhash_lsh(spark, sf_dir)
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(TOKENS_SQL).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    shset = (
        docs.filter(F.size("toks") >= 3)
        .select(
            "doc_id", F.array_distinct(F.expr(shingles_sql(3))).alias("sh")
        )
        .transform(materialize)
    )
    a = shset.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = shset.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    jac = inter.cast("double") / (F.size("a_sh") + F.size("b_sh") - inter)
    return (
        cand.join(a, cand.doc_a == F.col("a_id"))
        .join(b, cand.doc_b == F.col("b_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@register(
    "dedup_containment",
    f"""
    WITH tok AS (
      SELECT doc_id, source, {TOKENS_DUCK} AS toks FROM documents
    ), sh0 AS (
      SELECT doc_id, source, unnest(list_distinct({shingles_duck(3)})) AS shingle
      FROM tok WHERE len(toks) >= 3
    ), hot AS (
      SELECT source, shingle FROM sh0 GROUP BY source, shingle
      HAVING count(*) > 100
    ), sh AS (
      SELECT s.* FROM sh0 s LEFT JOIN hot h USING (source, shingle)
      WHERE h.shingle IS NULL
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.source = b.source AND a.shingle = b.shingle
                         AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_inter / CAST(sa.n_sh AS DOUBLE), 4) AS containment
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
    WHERE n_inter / CAST(sa.n_sh AS DOUBLE) >= 0.5
    """,
)
def dedup_containment(spark, sf_dir):
    """Asymmetric shingle CONTAINMENT C(A,B) = |A∩B| / |A| — the near-
    subset detector Jaccard structurally misses: a document truncated to
    30% of a longer one has Jaccard ≈ 0.3 (below any sane cut) but
    containment 1.0. Broder's resemblance-vs-containment distinction;
    training pipelines need both (truncation dups are endemic in web
    crawls).

    Same scale chassis as dedup_ngram_jaccard: blocked by `source`,
    df>100 hot shingles dropped symmetrically before sizes AND
    intersections (candidates linear in distinct shingle keys), the
    shingle equi-self-join emits ORDERED pairs (A-in-B and B-in-A score
    differently), one denominator join on the left (doc_a) side's size —
    the ordered-pair emission already covers both directions.

    r16-opt: same four-consumer explode reuse as dedup_ngram_jaccard
    (see its docstring) — the shingle explode materializes once; the
    anti-join stays above the checkpoint. Before-plan: 12 FileScans /
    32 Exchanges."""
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "source", F.expr(TOKENS_SQL).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    sh0 = (
        docs.filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(F.expr(shingles_sql(3)))).alias("shingle"),
        )
        .transform(materialize)
    )
    hot = (
        sh0.groupBy("source", "shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 100)
        .select("source", "shingle")
    )
    sh = sh0.join(hot, ["source", "shingle"], "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    cont = F.col("n_inter") / F.col("sa.n_sh").cast("double")
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .filter(cont >= 0.5)
        .select("doc_a", "doc_b", F.round(cont, 4).alias("containment"))
    )


# ---------------------------------------------------------------------------
# exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the k-token exact-match tier)
# ---------------------------------------------------------------------------

# Window length in tokens. Lee et al. use 50 at web-corpus scale; the
# synthetic documents table averages ~55 tokens/doc, so 20 keeps several
# windows per document while still being far too long to collide by chance.
SUBSTR_K = 20
SUBSTR_MAX_DF = 100


def _substring_oracle() -> str:
    k = SUBSTR_K
    return f"""
    WITH tok AS (
      SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
    ), grams0 AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             md5(list_aggregate(toks[i:i+{k - 1}], 'string_agg', ' ')) AS gkey
      FROM tok, unnest(range(1, len(toks) - {k} + 2)) AS t(i)
      WHERE len(toks) >= {k}
    ), hot AS (
      SELECT gkey FROM grams0 GROUP BY gkey
      HAVING count(DISTINCT doc_id) > {SUBSTR_MAX_DF}
    ), grams AS (
      SELECT g.* FROM grams0 g LEFT JOIN hot h USING (gkey)
      WHERE h.gkey IS NULL
    ), hits AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
             a.pos - b.pos AS diag
      FROM grams a JOIN grams b ON a.gkey = b.gkey AND a.doc_id < b.doc_id
    ), runs AS (
      SELECT doc_a, doc_b, diag,
             pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                        ORDER BY pos_a) AS grp
      FROM hits
    ), spans AS (
      SELECT doc_a, doc_b, count(*) AS run_len
      FROM runs GROUP BY doc_a, doc_b, diag, grp
    )
    SELECT doc_a, doc_b, CAST(sum(run_len) AS BIGINT) AS n_matches,
           CAST(max(run_len) + {k} - 1 AS BIGINT) AS longest_span
    FROM spans GROUP BY doc_a, doc_b
    """


@register("dedup_substring", _substring_oracle())
def dedup_substring(spark, sf_dir):
    """Exact substring dedup — the standard LLM tier between whole-doc
    hashing and shingle Jaccard (Lee et al. 2022's ExactSubstr, arXiv
    2107.06499): any SUBSTR_K-token span appearing verbatim in two
    documents is duplicated text, no matter how different the rest of the
    documents are. This is what catches licence headers, boilerplate and
    quoted passages that survive Jaccard (a 20-token quote in a 2000-token
    doc has Jaccard ≈ 0.01).

    Shape: every doc emits all sliding k-token windows WITH positions;
    windows are md5'd so the candidate equi-self-join shuffles 128-bit
    digests, never 20-token strings (~3× narrower exchange). Matching
    (pos_a, pos_b) hits are merged into maximal duplicated spans via
    anti-diagonal grouping (diag = pos_a - pos_b is constant along a
    contiguous shared span) + a gaps-and-islands pass (pos_a - row_number
    is constant within a consecutive run). Per ordered pair we report the
    total number of matching windows and the longest merged span in
    tokens.

    Scale: candidate generation is the minhash-style bucket shape — ONE
    exchange on the window digest, pairs emitted inside each bucket by an
    array expression, and the candidate-linearity cap (a window in >
    SUBSTR_MAX_DF distinct docs is corpus boilerplate whose pairs the
    cheaper exact/normalized tiers already catch; keeping it would fan
    out C(df,2)) is a free bucket-size filter rather than a separate
    hot-set groupBy + anti-join. The span-merge window function
    repartitions by (doc_a, doc_b, diag) — pure pair-local work, no
    global sort. Suffix-array approaches (the paper's) are sequential;
    this formulation is the shuffle-native equivalent with the same
    output contract."""
    k = SUBSTR_K
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(TOKENS_SQL).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(F.size("toks") >= k)
    )
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(toks) - {k} + 1), "
                f"i -> md5(concat_ws(' ', slice(toks, i, {k}))))"
            )
        ).alias("pos", "gkey"),
    )
    # Bucket by window digest and emit cross-doc (pos_a, diag) hits with an
    # array expression — ONE shuffle total, and the df>MAX_DF hot cap is a
    # free bucket-size filter (a self-join formulation recomputes the
    # explode+md5 subtree for the hot groupBy, the anti-join and both join
    # sides: 4x the hashing and 3 exchanges for identical output; same
    # lesson as dedup_minhash_lsh's bucket rewrite).
    buckets = (
        grams.groupBy("gkey")
        .agg(F.collect_list(F.struct("doc_id", "pos")).alias("es"))
        .filter(F.size(F.array_distinct("es.doc_id")) <= SUBSTR_MAX_DF)
        .filter(F.size("es") >= 2)
    )
    hits = buckets.select(
        F.explode(
            F.expr(
                "filter(flatten(transform(es, (x, i) -> "
                "transform(slice(es, i + 2, size(es)), y -> CASE "
                "WHEN x.doc_id < y.doc_id THEN named_struct("
                "'doc_a', x.doc_id, 'doc_b', y.doc_id, "
                "'pos_a', x.pos, 'diag', x.pos - y.pos) "
                "WHEN y.doc_id < x.doc_id THEN named_struct("
                "'doc_a', y.doc_id, 'doc_b', x.doc_id, "
                "'pos_a', y.pos, 'diag', y.pos - x.pos) "
                "END))), p -> p IS NOT NULL)"
            )
        ).alias("h")
    ).select("h.doc_a", "h.doc_b", "h.pos_a", "h.diag")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    spans = (
        hits.withColumn("grp", F.col("pos_a") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return spans.groupBy("doc_a", "doc_b").agg(
        F.sum("run_len").alias("n_matches"),
        (F.max("run_len") + k - 1).alias("longest_span"),
    )


def _substring_removal_oracle() -> str:
    k = SUBSTR_K
    return f"""
    WITH tok AS (
      SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
    ), grams0 AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             md5(list_aggregate(toks[i:i+{k - 1}], 'string_agg', ' ')) AS gkey
      FROM tok, unnest(range(1, len(toks) - {k} + 2)) AS t(i)
      WHERE len(toks) >= {k}
    ), hot AS (
      SELECT gkey FROM grams0 GROUP BY gkey
      HAVING count(DISTINCT doc_id) > {SUBSTR_MAX_DF}
    ), grams AS (
      SELECT g.* FROM grams0 g LEFT JOIN hot h USING (gkey)
      WHERE h.gkey IS NULL
    ), hits AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
             b.pos AS pos_b, a.pos - b.pos AS diag
      FROM grams a JOIN grams b ON a.gkey = b.gkey AND a.doc_id < b.doc_id
    ), runs AS (
      SELECT doc_a, doc_b, diag, pos_b,
             pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                        ORDER BY pos_a) AS grp
      FROM hits
    ), spans AS (
      SELECT doc_b, min(pos_b) AS sb,
             min(pos_b) + count(*) + {k} - 2 AS se
      FROM runs GROUP BY doc_a, doc_b, diag, grp
    ), rem AS (
      SELECT DISTINCT doc_b AS doc_id, CAST(p AS BIGINT) AS pos
      FROM spans, unnest(range(sb, se + 1)) AS t(p)
    ), tokpos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i] AS tok
      FROM tok, unnest(range(1, len(toks) + 1)) AS t(i)
    ), kept AS (
      SELECT tp.* FROM tokpos tp LEFT JOIN rem USING (doc_id, pos)
      WHERE rem.pos IS NULL
    ), affected AS (
      SELECT doc_id, count(*) AS n_removed FROM rem GROUP BY doc_id
    )
    SELECT a.doc_id, a.n_removed,
           CAST(COALESCE(count(kept.pos), 0) AS BIGINT) AS n_kept,
           COALESCE(string_agg(kept.tok, ' ' ORDER BY kept.pos), '')
               AS cleaned_text
    FROM affected a LEFT JOIN kept ON kept.doc_id = a.doc_id
    GROUP BY a.doc_id, a.n_removed
    """


@register("dedup_substring_removal", _substring_removal_oracle())
def dedup_substring_removal(spark, sf_dir):
    """Exact-substring REMOVAL — the second half of Lee et al. 2022's
    ExactSubstr: dedup_substring finds verbatim shared spans; this
    operator actually CLEANS them, deleting every duplicated span from
    the higher-id document of each pair (so the lowest doc_id keeps the
    canonical copy — chains converge to one surviving occurrence) and
    re-assembling the remaining tokens in order. Output: one row per
    affected document with tokens removed/kept and the cleaned text.

    Shape: the same single-shuffle digest-bucket candidate stage as
    dedup_substring, with pos_b carried through the span merge; maximal
    spans explode to removed token positions (bounded by document length,
    never corpus size), which anti-join the per-doc token positions. The
    cleaned text is an order-stable reassembly: array_sort over
    (pos, tok) structs then concat — deterministic under any partition
    order, so the oracle compares the STRINGS, not just counts. Interval
    overlap between spans from different pairs is handled by the DISTINCT
    position set, not interval algebra.

    r16-opt (guide §2.4): the removed-position set feeds BOTH the
    anti-join and the per-doc removal count, so the entire candidate
    pipeline — the md5 k-gram posexplode over the corpus, the bucket
    collect, the span merge window — ran TWICE as one lazy subtree
    (before-plan: 6 FileScans / 26 Exchanges, the Generate ladder
    duplicated). One localCheckpoint of the position set (bounded by
    affected-document token counts, the operator's own output grain)
    runs it once; after-plan has a single candidate ladder."""
    k = SUBSTR_K
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(TOKENS_SQL).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    eligible = docs.filter(F.size("toks") >= k)
    grams = eligible.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(toks) - {k} + 1), "
                f"i -> md5(concat_ws(' ', slice(toks, i, {k}))))"
            )
        ).alias("pos", "gkey"),
    )
    buckets = (
        grams.groupBy("gkey")
        .agg(F.collect_list(F.struct("doc_id", "pos")).alias("es"))
        .filter(F.size(F.array_distinct("es.doc_id")) <= SUBSTR_MAX_DF)
        .filter(F.size("es") >= 2)
    )
    hits = buckets.select(
        F.explode(
            F.expr(
                "filter(flatten(transform(es, (x, i) -> "
                "transform(slice(es, i + 2, size(es)), y -> CASE "
                "WHEN x.doc_id < y.doc_id THEN named_struct("
                "'doc_a', x.doc_id, 'doc_b', y.doc_id, "
                "'pos_a', x.pos, 'pos_b', y.pos, 'diag', x.pos - y.pos) "
                "WHEN y.doc_id < x.doc_id THEN named_struct("
                "'doc_a', y.doc_id, 'doc_b', x.doc_id, "
                "'pos_a', y.pos, 'pos_b', x.pos, 'diag', y.pos - x.pos) "
                "END))), p -> p IS NOT NULL)"
            )
        ).alias("h")
    ).select("h.doc_a", "h.doc_b", "h.pos_a", "h.pos_b", "h.diag")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    spans = (
        hits.withColumn("grp", F.col("pos_a") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pos_b").alias("sb"),
            (F.min("pos_b") + F.count(F.lit(1)) + k - 2).alias("se"),
        )
    )
    rem = (
        spans.select(
            F.col("doc_b").alias("doc_id"),
            F.explode(F.expr("sequence(sb, se)")).alias("pos"),
        )
        .distinct()
        .transform(materialize)
    )
    tokpos = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    kept = tokpos.join(rem, ["doc_id", "pos"], "left_anti")
    affected = rem.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_removed"))
    kept_agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_sort(collect_list(struct(pos, tok))), "
                "s -> s.tok)"
            ),
        ).alias("cleaned_text"),
    )
    return (
        affected.join(kept_agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_removed",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


# ---------------------------------------------------------------------------
# incremental MinHash index (index lifecycle: sign once, probe per batch)
# ---------------------------------------------------------------------------

# deterministic corpus split: every 10th doc is the "newly arrived" batch
INCR_BATCH_PRED = "doc_id % 10 = 0"
INCR_INDEX_PRED = "doc_id % 10 <> 0"


def _bands_df(spark, sf_dir, where: str):
    sig = minhash_signatures(spark, sf_dir, where=where)
    return sig.select(
        "doc_id",
        F.posexplode(F.array(*_band_cols_spark())).alias("band_id", "bh"),
    )


def _minhash_incremental_oracle() -> str:
    v = _hexval("md5(s)", "strpos")
    mcols = ",\n           ".join(
        f"list_min(list_transform(vals, v -> ({MIX_A[j]} * v + {MIX_B[j]}) % {MIX_M}))"
        f" AS m{j}"
        for j in range(NUM_HASHES)
    )
    band_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, md5({parts}) AS bh FROM sig".format(
            b=b,
            parts=" || '|' || ".join(
                f"CAST(m{b * ROWS_PER_BAND + r} AS VARCHAR)"
                for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
    ), sh AS (
      SELECT doc_id, {shingles_duck(3)} AS shingles FROM tok WHERE len(toks) >= 3
    ), vl AS (
      SELECT doc_id, list_transform(shingles, s -> CAST({v} AS BIGINT)) AS vals
      FROM sh
    ), sig AS (
      SELECT doc_id, {mcols} FROM vl
    ), bands AS (
      {band_rows}
    )
    SELECT b.doc_id AS batch_doc, ix.doc_id AS index_doc,
           count(*) AS n_bands
    FROM bands b JOIN bands ix ON b.band_id = ix.band_id AND b.bh = ix.bh
    WHERE b.doc_id % 10 = 0 AND ix.doc_id % 10 <> 0
    GROUP BY 1, 2
    """


@register("dedup_minhash_incremental", _minhash_incremental_oracle())
def dedup_minhash_incremental(spark, sf_dir):
    """Incremental MinHash-LSH — the INDEX LIFECYCLE the one-shot
    dedup_minhash_lsh lacks: a streaming-ingest pipeline cannot re-sign
    100 TB for every arriving batch. The standing corpus's band rows are
    signed ONCE and persisted as parquet partitioned by band_id (the
    build-once-serve-many pattern of sim_ivf_persist); each new batch
    signs only ITS documents (here the deterministic doc_id%10 slice) and
    equi-joins the persisted index on (band_id, band_hash). Output: one
    row per (new doc, indexed doc) candidate with the number of agreeing
    bands — the at-least-k-bands escalation knob.

    Scale shape: batch signing is map-only over the batch (corpus-size
    independent); the probe is a band-hash equi-join whose broadcast/
    shuffle choice AQE makes from the BATCH size, not the corpus size; in
    steady state the new batch's own bands are appended to the index
    (same partitioning, append mode), keeping the index current without
    rebuilds."""
    from xml_to_parquet_spark.io_paths import committed as _committed
    from xml_to_parquet_spark.io_paths import scratch_dir as _scratch

    idx_dir = _scratch(sf_dir, "minhash_band_index")
    # _SUCCESS-keyed guard: an interrupted prior build (partial parquet,
    # no commit marker) is rebuilt, never silently reused (ADVICE r7)
    if not _committed(idx_dir):
        _bands_df(spark, sf_dir, INCR_INDEX_PRED).write.mode(
            "overwrite"
        ).partitionBy("band_id").parquet(idx_dir)
    index = spark.read.schema("doc_id bigint, bh string, band_id int").parquet(
        idx_dir
    )
    batch = _bands_df(spark, sf_dir, INCR_BATCH_PRED)
    return (
        batch.join(
            index.select(
                F.col("doc_id").alias("index_doc"), "band_id", "bh"
            ),
            ["band_id", "bh"],
        )
        .groupBy(F.col("doc_id").alias("batch_doc"), "index_doc")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


# ---------------------------------------------------------------------------
# prefix-filtering set-similarity join (AllPairs / PPJoin family)
# ---------------------------------------------------------------------------

# Jaccard threshold as an exact ratio (0.5) so the survive test is pure
# integer arithmetic in both engines.
PF_NUM, PF_DEN = 1, 2


def _prefix_filter_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
    ), sh0 AS (
      SELECT doc_id, unnest(list_distinct({shingles_duck(3)})) AS shingle
      FROM tok WHERE len(toks) >= 3
    ), df AS (
      SELECT shingle, count(*) AS df FROM sh0 GROUP BY shingle
    ), ranked AS (
      SELECT s.doc_id, s.shingle,
             row_number() OVER (PARTITION BY s.doc_id
                                ORDER BY d.df, s.shingle) AS pos,
             count(*) OVER (PARTITION BY s.doc_id) AS n
      FROM sh0 s JOIN df d USING (shingle)
    ), pref AS (
      SELECT doc_id, shingle FROM ranked
      WHERE pos <= n - ({PF_NUM} * n + {PF_DEN} - 1) // {PF_DEN} + 1
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pref a JOIN pref b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh0 GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cand c
      JOIN sh0 a ON a.doc_id = c.doc_a
      JOIN sh0 b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE {PF_DEN} * n_inter >= {PF_NUM} * (sa.n + sb.n - n_inter)
    """


@register("dedup_prefix_filter", _prefix_filter_oracle())
def dedup_prefix_filter(spark, sf_dir):
    """Prefix-filtering set-similarity self-join (the AllPairs/PPJoin
    family — Bayardo et al. WWW'07, Xiao et al. WWW'08) over 3-gram
    shingle sets at Jaccard >= PF_NUM/PF_DEN: exact pairs, like
    dedup_ngram_jaccard, but the candidate bound comes from THEORY rather
    than a df cap. Shingles are globally ordered by ascending document
    frequency (ties by shingle); a doc with n shingles emits only its
    first n - ceil(t*n) + 1 in that order (its RAREST shingles), and the
    prefix-filter lemma guarantees any pair with J >= t shares at least
    one prefix shingle — J >= t implies |A∩B| >= t*max(|A|,|B|), so the
    intersection cannot avoid either prefix. At sf0.01 this generates 796
    candidates out of C(500,2) = 124,750 brute-force pairs (157x) with
    zero recall loss — and unlike the df cap, Jaccard is computed over
    the FULL shingle space.

    Scale shape: df is one combinable groupBy on shingle; shingles are
    dictionary-encoded to their global (df, shingle) rank (one
    vocabulary-sized window — Heaps-law bounded, the text_bpe_train
    device) so every downstream shuffle moves ints, not strings; the
    per-doc rank is one doc_id window; candidate generation equi-joins
    prefixes on the sid with PPJoin's LENGTH and POSITIONAL filters in
    the join condition (both recall-lossless — at sf0.1 they cut
    candidates 388k -> 125k on top of the prefix lemma's 12.5M -> 388k);
    verification is one array_intersect per surviving candidate over
    sorted int arrays (not a per-(pair, shingle) re-shuffle). The
    integer survive test (DEN*|∩| >= NUM*|∪|) makes the threshold
    decision bit-identical in both engines; the reported jaccard is one
    final rounded division. The oracle keeps the plain prefix-only
    formulation: the extra filters only shrink the CANDIDATE set, and
    both sides verify with exact full-space Jaccard, so the final pair
    sets are provably identical (the brute-force pytest re-proves it)."""
    from pyspark.sql import Window

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(TOKENS_SQL).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    sh0 = docs.filter(F.size("toks") >= 3).select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(shingles_sql(3)))).alias("shingle"),
    )
    # dictionary-encode shingles as their global (df, shingle) rank: one
    # combinable df groupBy + a vocabulary-sized window (Heaps-law
    # bounded, the text_bpe_train device). Integer sids make the per-doc
    # rank a plain orderBy(sid) and shrink every downstream shuffle and
    # array op ~5x vs shuffling shingle strings.
    df = sh0.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    dict_ = df.withColumn(
        "sid", F.row_number().over(Window.orderBy("df", "shingle"))
    ).select("shingle", "sid")
    # localCheckpoint: sh1 feeds the rank window, the verify arrays, and
    # (via pref) candidate generation; without materialization each
    # consumer re-runs the tokenize+explode+dict lineage
    sh1 = sh0.join(dict_, "shingle").select("doc_id", "sid").transform(materialize)
    ranked = sh1.withColumn(
        "pos", F.row_number().over(Window.partitionBy("doc_id").orderBy("sid"))
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    # prefix length n - ceil(t*n) + 1: if A's first n - ceil(t*n) + 1
    # df-ordered shingles all miss the intersection, the suffix's
    # ceil(t*n) - 1 slots cannot hold the >= ceil(t*n) shared shingles a
    # qualifying pair must have (the +1 is load-bearing: without it a
    # 1-shingle doc gets an EMPTY prefix and identical 1-shingle docs are
    # lost — caught by the hypothesis lemma test, not by the corpus)
    prefix_len = F.col("n") - F.expr(
        f"({PF_NUM} * n + {PF_DEN} - 1) div {PF_DEN}"
    ) + 1
    pref = ranked.filter(F.col("pos") <= prefix_len).select(
        "doc_id", "sid", "pos", "n"
    )
    a = pref.alias("a")
    b = pref.alias("b")
    # PPJoin filters on top of the prefix lemma (all recall-lossless):
    # length (J >= t forces t*|A| <= |B| <= |A|/t) and positional (the
    # remaining-suffix overlap upper bound 1 + min(na-pa, nb-pb) must
    # reach alpha = ceil(t/(1+t)*(na+nb)) — integerized via
    # (NUM+DEN)*ubound >= NUM*(na+nb)). Together they cut sf0.1
    # candidates 387,906 -> 124,979 on top of the prefix lemma's 12.5M
    # -> 388k.
    ubound = F.lit(1) + F.least(
        F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
    )
    cand = (
        a.join(
            b,
            (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (PF_NUM * F.col("a.n") <= PF_DEN * F.col("b.n"))
            & (PF_NUM * F.col("b.n") <= PF_DEN * F.col("a.n"))
            & ((PF_NUM + PF_DEN) * ubound >= PF_NUM * (F.col("a.n") + F.col("b.n"))),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify: per-pair exact intersection via sorted int arrays — one
    # array_intersect per candidate instead of re-shuffling every
    # (pair, shingle) row (was the dominant cost: ~20M intermediate rows)
    arrs = sh1.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("sid")).alias("sh"),
        F.count(F.lit(1)).alias("n"),
    )
    aa = arrs.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
        F.col("n").alias("na"),
    )
    bb = arrs.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
        F.col("n").alias("nb"),
    )
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union_sz = F.col("na") + F.col("nb") - F.col("n_inter")
    return (
        cand.join(aa, "doc_a")
        .join(bb, "doc_b")
        .withColumn("n_inter", n_inter)
        .filter(PF_DEN * F.col("n_inter") >= PF_NUM * union_sz)
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_inter").cast("double") / union_sz, 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# entity resolution: pigeonhole blocking + edit-distance verify
# ---------------------------------------------------------------------------

ER_SEGS = 3  # segment count; 1 substitution corrupts at most 1 segment


def _er_oracle() -> str:
    h = _hexval("md5('er' || CAST(c_custkey AS VARCHAR))", "instr")
    return f"""
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             substr(md5(CAST(c_custkey AS VARCHAR)), 1, 9) AS rid
      FROM customer
    ), e0 AS (
      SELECT c_custkey AS record_id, c_nationkey, rid, {h} AS h
      FROM c WHERE c_custkey % 3 = 0
    ), e1 AS (
      SELECT record_id, c_nationkey, rid,
             CAST(1 + h % 9 AS INT) AS p, CAST((h // 9) % 16 AS INT) AS dd
      FROM e0
    ), dirty AS (
      SELECT record_id, c_nationkey,
             substr(rid, 1, p - 1)
             || (CASE WHEN substr('0123456789abcdef', dd + 1, 1)
                           = substr(rid, p, 1)
                      THEN substr('0123456789abcdef', ((dd + 1) % 16) + 1, 1)
                      ELSE substr('0123456789abcdef', dd + 1, 1) END)
             || substr(rid, p + 1) AS drid
      FROM e1
    ), db AS (
      SELECT record_id, c_nationkey, i AS seg_i,
             substr(drid, (i - 1) * 3 + 1, 3) AS seg
      FROM dirty, generate_series(1, {ER_SEGS}) t(i)
    ), cb AS (
      SELECT c_custkey, c_nationkey, i AS seg_i,
             substr(rid, (i - 1) * 3 + 1, 3) AS seg
      FROM c, generate_series(1, {ER_SEGS}) t(i)
    ), cand AS (
      SELECT db.record_id, cb.c_custkey AS matched_custkey,
             count(*) AS n_blocks
      FROM db JOIN cb ON db.seg_i = cb.seg_i AND db.seg = cb.seg
                     AND db.c_nationkey = cb.c_nationkey
      GROUP BY 1, 2
    )
    SELECT cand.record_id, matched_custkey,
           CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(levenshtein(d.drid, c.rid) AS BIGINT) AS dist
    FROM cand
    JOIN dirty d ON d.record_id = cand.record_id
    JOIN c ON c.c_custkey = cand.matched_custkey
    WHERE levenshtein(d.drid, c.rid) <= 1
    """


@register("er_blocking_link", _er_oracle())
def er_blocking_link(spark, sf_dir):
    """Entity resolution (record linkage) with pigeonhole blocking: a
    deterministically-corrupted copy of every third customer (one
    md5-derived hex-char substitution in a 9-char md5-derived record ID —
    the tpch_derived device for an engine-identical 'dirty' table) is
    linked back to the clean roster. Blocking splits the ID into ER_SEGS
    3-char segments: one substitution corrupts at most one segment, so
    every true pair shares >= ER_SEGS-1 segment blocks — guaranteed
    recall by pigeonhole, the same principle as dedup_simhash's MJS
    bands, applied to edit distance (q-gram segment filtering, à la
    PassJoin). Candidates sharing any (segment_idx, segment_value,
    nationkey) block are verified with JVM-side levenshtein <= 1.
    Output: (record_id, matched_custkey, n_blocks, dist) — self-matches
    are the true links (full recall proven in pytest); extra rows are
    genuinely ambiguous one-char neighbors, the output a human review
    queue would consume.

    Scale shape: blocking is map-only explode (ER_SEGS rows/record); the
    candidate join hashes on (seg_i, seg, nation). Segment values MUST
    be high-entropy for the pigeonhole to bound block sizes — the md5
    ID gives 16^3 uniform values per segment (a first draft blocked on
    reverse-zero-padded key DIGITS, whose high-order segment was '000'
    for every customer: one 2M-row hot block at sf0.1, the exact
    quadratic this operator exists to avoid; 2.6s -> 0.6s after).
    Verify touches candidates only; levenshtein runs in codegen (no
    Python); the 1-per-record dirty table is localCheckpoint'ed so the
    md5 derivation chain isn't re-expanded per consumer. At 100 TB the
    segment index would persist like dedup_minhash_incremental's band
    index."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    # localCheckpoint: c feeds THREE subtrees (dirty's derivation, the cb
    # blocking side, and the verify join) — materialize the scan + md5
    # projection once instead of re-running it per consumer
    c = cust.withColumn(
        "rid", F.expr("substring(md5(CAST(c_custkey AS STRING)), 1, 9)")
    ).transform(materialize)
    h = _hexval("md5('er' || CAST(c_custkey AS STRING))", "instr")
    hexd = "'0123456789abcdef'"
    dirty = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .withColumn("h", F.expr(h))
        .withColumn("p", F.expr("CAST(1 + h % 9 AS INT)"))
        .withColumn("dd", F.expr("CAST((h div 9) % 16 AS INT)"))
        .select(
            F.col("c_custkey").alias("record_id"),
            "c_nationkey",
            F.expr(
                "concat(substring(rid, 1, p - 1), "
                f"CASE WHEN substring({hexd}, dd + 1, 1) = substring(rid, p, 1) "
                f"THEN substring({hexd}, ((dd + 1) % 16) + 1, 1) "
                f"ELSE substring({hexd}, dd + 1, 1) END, "
                "substring(rid, p + 1))"
            ).alias("drid"),
        )
        .transform(materialize)
    )
    seg_structs = lambda col: [  # noqa: E731
        F.struct(
            F.lit(i).alias("seg_i"),
            F.expr(f"substring({col}, {(i - 1) * 3 + 1}, 3)").alias("seg"),
        )
        for i in range(1, ER_SEGS + 1)
    ]
    db = dirty.select(
        "record_id", "c_nationkey", F.explode(F.array(*seg_structs("drid"))).alias("b")
    ).select("record_id", "c_nationkey", "b.seg_i", "b.seg")
    cb = c.select(
        F.col("c_custkey"), "c_nationkey",
        F.explode(F.array(*seg_structs("rid"))).alias("b"),
    ).select("c_custkey", "c_nationkey", "b.seg_i", "b.seg")
    cand = (
        db.join(cb, ["seg_i", "seg", "c_nationkey"])
        .groupBy("record_id", F.col("c_custkey").alias("matched_custkey"))
        .agg(F.count(F.lit(1)).alias("n_blocks"))
    )
    dist = F.levenshtein(F.col("drid"), F.col("rid"))
    return (
        cand.join(dirty.select("record_id", "drid"), "record_id")
        .join(
            c.select(F.col("c_custkey").alias("matched_custkey"), "rid"),
            "matched_custkey",
        )
        .filter(dist <= 1)
        .select(
            "record_id",
            "matched_custkey",
            "n_blocks",
            dist.cast("bigint").alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# bloom-filter ingest prefilter (deterministic, engine-mirrorable)
# ---------------------------------------------------------------------------

BLOOM_M = 2048  # bits in the filter
BLOOM_K = 3  # hash functions

# the arriving batch: every 10th doc; half of it (doc_id % 20 == 0)
# REPLAYS the content of its corpus neighbor (doc_id - 1) so the filter
# sees true re-ingests as well as fresh content
BLOOM_CORPUS_PRED = "doc_id % 10 != 0"
BLOOM_BATCH_PRED = "doc_id % 10 = 0"


def _bloom_pos(j: int, h_col: str) -> str:
    """Bit position j for content hash column: md5-derived, engine-common."""
    md5_expr = f"md5('{j}|' || {h_col})"
    return f"({_hexval(md5_expr, 'instr')}) % {BLOOM_M}"


def _bloom_oracle() -> str:
    poss = ", ".join(
        f"CAST({_bloom_pos(j, 'h')} AS BIGINT) AS p{j}" for j in range(BLOOM_K)
    )
    batch_pos_union = " UNION ALL ".join(
        f"SELECT doc_id, p{j} AS pos FROM bkeys" for j in range(BLOOM_K)
    )
    corpus_pos_union = " UNION ALL ".join(
        f"SELECT p{j} AS pos FROM ckeys" for j in range(BLOOM_K)
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, md5(lower(trim(text))) AS h FROM documents
      WHERE {BLOOM_CORPUS_PRED}
    ), batch0 AS (
      SELECT b.doc_id,
             md5(lower(trim(CASE WHEN b.doc_id % 20 = 0 THEN n.text
                                 ELSE b.text END))) AS h
      FROM documents b
      LEFT JOIN documents n ON n.doc_id = b.doc_id - 1
      WHERE b.{BLOOM_BATCH_PRED}
    ), ckeys AS (SELECT doc_id, h, {poss} FROM corpus),
    bkeys AS (SELECT doc_id, h, {poss} FROM batch0),
    bits AS (SELECT DISTINCT pos FROM ({corpus_pos_union})),
    probe AS ({batch_pos_union}),
    hits AS (
      SELECT p.doc_id, count(b.pos) AS n_hits
      FROM probe p LEFT JOIN bits b ON b.pos = p.pos
      GROUP BY p.doc_id
    )
    SELECT hits.doc_id, CAST(n_hits AS BIGINT) AS n_hits,
           n_hits = {BLOOM_K} AS bloom_positive,
           (c.h IS NOT NULL) AS true_dup
    FROM hits
    JOIN bkeys ON bkeys.doc_id = hits.doc_id
    LEFT JOIN (SELECT DISTINCT h FROM corpus) c ON c.h = bkeys.h
    """


@register("dedup_bloom_prefilter", _bloom_oracle())
def dedup_bloom_prefilter(spark, sf_dir):
    """Bloom-filter ingest prefilter: 'has this content been seen in the
    standing corpus?' answered with a BLOOM_M-bit, BLOOM_K-hash bloom
    filter materialized as its set-bit positions — fully deterministic
    (md5-derived positions), so the DuckDB oracle reproduces every bit
    and every false positive. The arriving batch (every 10th doc; half
    deliberately re-ingests its corpus neighbor's content, the
    tpch_derived fixture device) probes the filter: all K positions set
    => bloom-positive, routed to exact verification; any position clear
    => GUARANTEED new (no false negatives — the contract that lets the
    fast path skip verification entirely). true_dup (the exact check) is
    emitted alongside so the output exposes the false-positive rate the
    M/K sizing buys.

    Scale shape: the filter is at most BLOOM_M distinct rows NO MATTER
    the corpus size — the whole point: membership state bounded by
    filter geometry, not data volume; it broadcasts to the probe side
    (left join on pos) while the corpus itself is never rescanned at
    ingest. Building it is one map-side explode (K positions/doc) + one
    distinct. At 100 TB the bits table would persist and new batches
    append their own positions (dedup_minhash_incremental's lifecycle)."""
    docs = table(spark, sf_dir, "documents")
    # r16-opt (guide §2.4): the corpus fingerprint table feeds the bit-set
    # build AND the exact-hash verification set, so the scan + md5 pass
    # ran twice (before-plan: 4 FileScans). One localCheckpoint of the
    # narrow (doc_id, h) rows computes it once — the same device the
    # batch side (bkeys) already used.
    corpus = (
        docs.filter(F.expr(BLOOM_CORPUS_PRED))
        .select("doc_id", F.expr("md5(lower(trim(text)))").alias("h"))
        .transform(materialize)
    )
    nbr = docs.select(F.col("doc_id").alias("n_id"), F.col("text").alias("n_text"))
    batch = (
        docs.filter(F.expr(BLOOM_BATCH_PRED))
        .join(nbr, F.col("n_id") == F.col("doc_id") - 1, "left")
        .select(
            "doc_id",
            F.expr(
                "md5(lower(trim(CASE WHEN doc_id % 20 = 0 THEN n_text "
                "ELSE text END)))"
            ).alias("h"),
        )
    )
    pos_cols = [
        F.expr(_bloom_pos(j, "h")).cast("bigint").alias(f"p{j}")
        for j in range(BLOOM_K)
    ]
    ckeys = corpus.select("doc_id", "h", *pos_cols)
    bkeys = batch.select("doc_id", "h", *pos_cols).transform(materialize)
    bits = (
        ckeys.select(F.explode(F.array(*[f"p{j}" for j in range(BLOOM_K)])).alias("pos"))
        .distinct()
    )
    probe = bkeys.select(
        "doc_id", F.explode(F.array(*[f"p{j}" for j in range(BLOOM_K)])).alias("pos")
    )
    hits = (
        probe.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("doc_id")
        .agg(F.count("hit").alias("n_hits"))
    )
    corpus_hashes = corpus.select("h").distinct().withColumn("seen", F.lit(1))
    return (
        hits.join(bkeys.select("doc_id", "h"), "doc_id")
        .join(corpus_hashes, "h", "left")
        .select(
            "doc_id",
            F.col("n_hits").cast("bigint").alias("n_hits"),
            (F.col("n_hits") == BLOOM_K).alias("bloom_positive"),
            F.col("seen").isNotNull().alias("true_dup"),
        )
    )


# ---------------------------------------------------------------------------
# Fellegi–Sunter probabilistic record linkage — the DECISION-MODEL layer
# on top of er_blocking_link's candidate generation
# ---------------------------------------------------------------------------

FS_W_NAME_EXACT, FS_W_NAME_CLOSE, FS_W_NAME_DIFF = 40, 25, -30
FS_W_PHONE_EXACT, FS_W_PHONE_DIFF = 45, -35
FS_W_CITY_EXACT, FS_W_CITY_DIFF = 20, -20
FS_T_MATCH, FS_T_POSSIBLE = 50, 0  # score thresholds (scaled log-ratios)


def _fs_records_sql() -> str:
    """Derived identity roster shared by op and oracle: real c_name, an
    md5-derived 10-hex 'phone', and nationkey as 'city'."""
    return """
      SELECT c_custkey, c_name AS name,
             substr(md5('ph' || CAST(c_custkey AS VARCHAR)), 1, 10) AS phone,
             c_nationkey AS city
      FROM customer
    """


def _fs_dirty_sql() -> str:
    """Dirty re-entry roster (the tpch_derived corruption device) over a
    CTE named ``clean`` — shared by the FS oracle and er_survivorship."""
    return """
      SELECT c_custkey AS rid,
             CASE WHEN c_custkey % 12 = 0 THEN name ELSE
               substr(name, 1, 9 + c_custkey % 8)
               || substr(md5('nm' || CAST(c_custkey AS VARCHAR)), 1, 1)
               || substr(name, 11 + c_custkey % 8)
             END AS name,
             CASE WHEN c_custkey % 20 = 0 AND c_custkey % 12 <> 0
                  THEN substr(phone, 1, 9) || 'z' ELSE phone END AS phone,
             CASE WHEN c_custkey % 12 = 0 THEN (city + 7) % 25
                  ELSE city END AS city
      FROM (SELECT c_custkey, name, phone, city
            FROM clean JOIN customer USING (c_custkey)
            WHERE c_custkey % 4 = 0) AS picked
    """


def _fs_oracle() -> str:
    return f"""
    WITH clean AS ({_fs_records_sql()}),
    dirty AS ({_fs_dirty_sql()}),
    cand AS (
      SELECT d.rid, c.c_custkey AS cand_custkey,
             CASE WHEN d.name = c.name THEN 2
                  WHEN levenshtein(d.name, c.name) <= 2 THEN 1
                  ELSE 0 END AS a_name,
             CASE WHEN d.phone = c.phone THEN 1 ELSE 0 END AS a_phone,
             CASE WHEN d.city = c.city THEN 1 ELSE 0 END AS a_city
      FROM dirty d JOIN clean c
        ON substr(d.phone, 1, 2) = substr(c.phone, 1, 2)
    ),
    scored AS (
      SELECT rid, cand_custkey, a_name, a_phone, a_city,
             CASE a_name WHEN 2 THEN {FS_W_NAME_EXACT}
                         WHEN 1 THEN {FS_W_NAME_CLOSE}
                         ELSE {FS_W_NAME_DIFF} END
             + CASE a_phone WHEN 1 THEN {FS_W_PHONE_EXACT}
                            ELSE {FS_W_PHONE_DIFF} END
             + CASE a_city WHEN 1 THEN {FS_W_CITY_EXACT}
                           ELSE {FS_W_CITY_DIFF} END AS score
      FROM cand
    )
    SELECT rid, cand_custkey, a_name, a_phone, a_city, score,
           CASE WHEN score >= {FS_T_MATCH} THEN 'match'
                WHEN score >= {FS_T_POSSIBLE} THEN 'possible'
                ELSE 'non_match' END AS decision
    FROM scored
    """


def _fs_rosters(spark, sf_dir):
    """(clean, dirty) identity rosters — the Spark twins of
    _fs_records_sql / _fs_dirty_sql, shared by FS scoring and
    er_survivorship's member-attribute join."""
    c = table(spark, sf_dir, "customer")
    clean = c.select(
        "c_custkey",
        F.col("c_name").alias("name"),
        F.expr(
            "substr(md5('ph' || CAST(c_custkey AS STRING)), 1, 10)"
        ).alias("phone"),
        F.col("c_nationkey").alias("city"),
    ).transform(materialize)
    picked = clean.filter(F.col("c_custkey") % 4 == 0)
    dirty = picked.select(
        F.col("c_custkey").alias("rid"),
        F.when(F.col("c_custkey") % 12 == 0, F.col("name"))
        .otherwise(
            F.expr(
                "substr(name, 1, 9 + c_custkey % 8) "
                "|| substr(md5('nm' || CAST(c_custkey AS STRING)), 1, 1) "
                "|| substr(name, 11 + c_custkey % 8)"
            )
        )
        .alias("name"),
        F.when(
            (F.col("c_custkey") % 20 == 0) & (F.col("c_custkey") % 12 != 0),
            F.expr("substr(phone, 1, 9) || 'z'"),
        )
        .otherwise(F.col("phone"))
        .alias("phone"),
        F.when(F.col("c_custkey") % 12 == 0, (F.col("city") + 7) % 25)
        .otherwise(F.col("city"))
        .alias("city"),
    )
    return clean, dirty


@register("er_fellegi_sunter", _fs_oracle())
def er_fellegi_sunter(spark, sf_dir):
    """Fellegi–Sunter probabilistic record linkage (JASA 1969 — the
    decision model behind Splink/dedupe.io): blocked candidate pairs get
    a per-field AGREEMENT VECTOR (name exact / within-edit-2 / differs;
    derived-phone exact; city exact), the vector maps through a
    log-likelihood-ratio weight table (scaled-integer literals, the
    'trained offline, broadcast at serve time' artifact), and the summed
    score classifies match / possible / non-match — the three-way
    decision with a human-review band that separates FS from the
    hard-threshold er_blocking_link. The dirty table is the
    tpch_derived corruption device: every 4th customer re-enters with a
    one-char md5-derived name substitution, and every 12th instead moves
    city — so true pairs arrive with DIFFERENT agreement vectors
    (2/1/1 exact-ish, 1/1/1 name-edited, 2/1/0 city-moved, 1/0/1
    phone-moved) and the classifier provably decides on the weighted
    EVIDENCE, not one field: the first three land 'match', the
    phone-moved plant lands in the 'possible' human-review band — the
    three-way decision exercised by construction (pytest pins per-plant
    class by custkey arithmetic and that all classes are populated).

    Scale shape: candidates come from an equi-join on the 2-hex phone
    prefix (256 uniform blocks — high-entropy blocking, the
    er_blocking_link lesson); agreements and levenshtein run in codegen
    on candidates only; the weight table is constant-folded literals (a
    real deployment broadcasts it); the decision is a projection. At
    100 TB: blocking bounds the quadratic, multi-pass blocking unions
    more candidate sets in front of the SAME scorer — the FS layer
    itself never rescans the roster."""
    clean, dirty = _fs_rosters(spark, sf_dir)
    d = dirty.alias("d")
    cl = clean.alias("c")
    cand = d.join(
        cl,
        F.expr("substr(d.phone, 1, 2) = substr(c.phone, 1, 2)"),
    ).select(
        F.col("d.rid").alias("rid"),
        F.col("c.c_custkey").alias("cand_custkey"),
        F.when(F.col("d.name") == F.col("c.name"), 2)
        .when(F.expr("levenshtein(d.name, c.name) <= 2"), 1)
        .otherwise(0)
        .alias("a_name"),
        F.when(F.col("d.phone") == F.col("c.phone"), 1).otherwise(0).alias(
            "a_phone"
        ),
        F.when(F.col("d.city") == F.col("c.city"), 1).otherwise(0).alias(
            "a_city"
        ),
    )
    score = (
        F.when(F.col("a_name") == 2, FS_W_NAME_EXACT)
        .when(F.col("a_name") == 1, FS_W_NAME_CLOSE)
        .otherwise(FS_W_NAME_DIFF)
        + F.when(F.col("a_phone") == 1, FS_W_PHONE_EXACT).otherwise(
            FS_W_PHONE_DIFF
        )
        + F.when(F.col("a_city") == 1, FS_W_CITY_EXACT).otherwise(FS_W_CITY_DIFF)
    )
    scored = cand.withColumn("score", score)
    return scored.withColumn(
        "decision",
        F.when(F.col("score") >= FS_T_MATCH, F.lit("match"))
        .when(F.col("score") >= FS_T_POSSIBLE, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )


# ---------------------------------------------------------------------------
# incremental containment probe — dedup_containment's asymmetric score on
# dedup_minhash_incremental's persisted-index lifecycle
# ---------------------------------------------------------------------------

# Corpus split for the containment index. NOT the %10 split the minhash
# index uses: the synthetic corpus plants every near-duplicate pair at a
# doc_id delta divisible by 10 (measured: all overlapping pairs have
# doc_a ≡ doc_b mod 10 at every SF), so a %10 batch/index split would
# never see a planted overlap cross it. The mod-3 split crosses 259 of
# the 1136 filtered candidate pairs at sf0.01 — including the one
# genuine containment pair (387 ⊂ 107).
CONT_INCR_BATCH_PRED = "doc_id % 3 = 0"
CONT_INCR_INDEX_PRED = "doc_id % 3 <> 0"


def _cont_shingles(spark, sf_dir, where: str):
    docs = (
        table(spark, sf_dir, "documents")
        .filter(where)
        .select("doc_id", "source", F.expr(TOKENS_SQL).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return docs.filter(F.size("toks") >= 3).select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(F.expr(shingles_sql(3)))).alias("shingle"),
    )


def _containment_incremental_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, source, {TOKENS_DUCK} AS toks FROM documents
    ), sh0 AS (
      SELECT doc_id, source, unnest(list_distinct({shingles_duck(3)})) AS shingle
      FROM tok WHERE len(toks) >= 3
    ), hot AS (
      SELECT source, shingle FROM sh0 WHERE {CONT_INCR_INDEX_PRED}
      GROUP BY 1, 2 HAVING count(*) > 100
    ), sh AS (
      SELECT s.* FROM sh0 s LEFT JOIN hot h USING (source, shingle)
      WHERE h.shingle IS NULL
    ), sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh
      WHERE {CONT_INCR_BATCH_PRED} GROUP BY 1
    ), inter AS (
      SELECT b.doc_id AS batch_doc, ix.doc_id AS index_doc,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM sh b JOIN sh ix ON b.source = ix.source AND b.shingle = ix.shingle
      WHERE b.{CONT_INCR_BATCH_PRED} AND ix.{CONT_INCR_INDEX_PRED}
      GROUP BY 1, 2
    )
    SELECT batch_doc, index_doc, n_inter, sa.n_sh,
           round(n_inter / CAST(sa.n_sh AS DOUBLE), 4) AS containment
    FROM inter JOIN sizes sa ON sa.doc_id = batch_doc
    """


@register(
    "dedup_containment_incremental", _containment_incremental_oracle()
)
def dedup_containment_incremental(spark, sf_dir):
    """Incremental CONTAINMENT probe — dedup_containment's asymmetric
    C(batch, indexed) = |A∩B| / |A| on dedup_minhash_incremental's
    build-once / probe-many index lifecycle. A streaming-ingest pipeline
    cannot re-shingle 100 TB per arriving batch; here the standing
    corpus is shingled ONCE into two persisted artifacts — (a) the
    hot-shingle stoplist (index-side df > 100: corpus-stable, so a
    batch never flips a shingle's hotness retroactively) and (b) the
    stoplist-filtered inverted shingle index — and each batch shingles
    only ITS documents, drops the PERSISTED stoplist's shingles, and
    equi-joins the persisted index on (source, shingle). Output: every
    (batch doc, indexed doc) candidate with the overlap count, the
    batch doc's filtered shingle count, and containment = n_inter/n_sh
    (a division of identical int64s, round(4)ed LAST) — unthresholded,
    because the escalation cut is policy (dedup_containment applies
    0.5) while the probe's contract is the scored candidate set.

    Both artifacts carry their own _SUCCESS guard, written stoplist
    FIRST (the index derives from it): an interrupted build re-runs the
    missing artifact and never serves a stoplist/index mismatch — the
    per-artifact pattern lake_manifest_prune uses (ADVICE r10).

    Scale shape: batch shingling is map-only over the batch
    (corpus-size independent); the probe is a (source, shingle)
    equi-join whose broadcast/shuffle choice AQE makes from the BATCH
    side; the candidate aggregate partial-combines map-side keyed on
    the pair. In steady state a graded batch's own shingles append to
    the index (same layout, append mode) — O(batch), never a rebuild.
    The split constant is mod-3, not minhash's mod-10: the corpus
    plants ALL near-dup pairs at id deltas ≡ 0 (mod 10), so a %10
    split structurally cannot cross one (measured at every SF)."""
    from xml_to_parquet_spark.io_paths import committed as _committed
    from xml_to_parquet_spark.io_paths import scratch_dir as _scratch

    hot_dir = _scratch(sf_dir, "containment_hot_stoplist")
    idx_dir = _scratch(sf_dir, "containment_shingle_index")
    idx_sh = _cont_shingles(spark, sf_dir, CONT_INCR_INDEX_PRED)
    if not _committed(hot_dir):
        (
            idx_sh.groupBy("source", "shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > 100)
            .select("source", "shingle")
            .write.mode("overwrite")
            .parquet(hot_dir)
        )
    hot = spark.read.schema("source string, shingle string").parquet(hot_dir)
    if not _committed(idx_dir):
        (
            idx_sh.join(hot, ["source", "shingle"], "left_anti")
            # cluster by shingle so probe-side row-group min/max stats
            # prune; at real scale this is a hash-bucket layout
            .repartition("source", "shingle")
            .write.mode("overwrite")
            .parquet(idx_dir)
        )
    index = spark.read.schema(
        "doc_id bigint, source string, shingle string"
    ).parquet(idx_dir)
    batch = _cont_shingles(spark, sf_dir, CONT_INCR_BATCH_PRED).join(
        hot, ["source", "shingle"], "left_anti"
    )
    sizes = batch.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sh")
    )
    inter = (
        batch.join(
            index.select(
                F.col("doc_id").alias("index_doc"), "source", "shingle"
            ),
            ["source", "shingle"],
        )
        .groupBy(F.col("doc_id").alias("batch_doc"), "index_doc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("batch_doc"), "n_sh"),
            "batch_doc",
        )
        .select(
            "batch_doc",
            "index_doc",
            "n_inter",
            "n_sh",
            F.round(F.col("n_inter") / F.col("n_sh").cast("double"), 4).alias(
                "containment"
            ),
        )
    )


# ---------------------------------------------------------------------------
# entity clustering — the RESOLUTION step closing the ER ladder:
# block (er_blocking_link) → decide (er_fellegi_sunter) → cluster (here)
# ---------------------------------------------------------------------------

# Dirty records share the clean roster's custkey space (rid IS the picked
# customer's key), so clustering needs disjoint node ids: dirty nodes are
# offset above the clean key range. The constant covers custkeys < 10M
# (TPC-H-style rosters up to ~sf67); it is NOT universal — the oracle SQL
# bakes the same literal in, so the Spark side enforces the precondition
# loudly at runtime (a 1-row max over the match-sized pair list) instead
# of silently merging unrelated entities past the bound (ADVICE r10).
ER_NODE_OFFSET = 10_000_000


def _assert_er_node_ranges_disjoint(max_clean_key) -> None:
    if max_clean_key is not None and max_clean_key >= ER_NODE_OFFSET:
        raise ValueError(
            f"clean key {max_clean_key} >= ER_NODE_OFFSET {ER_NODE_OFFSET}: "
            "dirty/clean node id ranges collide; raise the offset (and its "
            "oracle literal) for this roster"
        )


def _er_cluster_oracle() -> str:
    return f"""
    WITH fs AS ({_fs_oracle()}),
    pairs AS (
      SELECT rid + {ER_NODE_OFFSET} AS a, cand_custkey AS b
      FROM fs WHERE decision = 'match'
    ),
    edges AS (
      SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach AS (
      WITH RECURSIVE r(node, lab) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.lab FROM r JOIN edges e ON e.a = r.node
      )
      SELECT * FROM r
    ),
    ent AS (
      SELECT node AS member_id, CAST(min(lab) AS BIGINT) AS entity_id
      FROM reach GROUP BY node
    )
    SELECT member_id, entity_id,
           CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT) AS n_members
    FROM ent
    """


@register("er_cluster_entities", _er_cluster_oracle())
def er_cluster_entities(spark, sf_dir):
    """Entity resolution's final step: Fellegi–Sunter 'match' decisions
    become edges of a bipartite dirty↔clean graph (dirty record ids
    offset into a disjoint range) and connected components assign each
    member a stable entity_id = min member id — transitivity is the
    point: if two dirty re-entries both match the same clean customer
    (or one dirty matches two cleans through a shared block), their
    records MUST land in one entity even though they never compared
    against each other, which pairwise output alone cannot express
    (Splink's cluster_pairwise_predictions step). n_members is the
    review signal — an entity swallowing many members flags an
    over-permissive threshold. Only 'match' edges cluster; the
    'possible' band stays out (human review must not be transitively
    collapsed away).

    Scale shape: reuses connected_components' pointer-jumping min-label
    propagation — O(log diameter) rounds of node/label-keyed equi-joins
    with per-round checkpoint (the exact machinery dedup_components
    runs at corpus scale); the edge list is |matches|-sized, the final
    member count a window over the entity-sized result. The oracle
    computes the same fixpoint by recursive transitive closure."""
    fs = er_fellegi_sunter(spark, sf_dir)
    pairs = (
        fs.filter(F.col("decision") == "match")
        .select(
            (F.col("rid") + ER_NODE_OFFSET).alias("a"),
            F.col("cand_custkey").alias("b"),
        )
        .transform(materialize)
    )
    # Disjointness precondition (see ER_NODE_OFFSET): 1-row agg over the
    # already-checkpointed match-sized pair list; survivorship inherits
    # the guarantee (its inner join keeps only matched member ids).
    _assert_er_node_ranges_disjoint(pairs.agg(F.max("b")).collect()[0][0])
    edges = pairs.unionAll(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).transform(materialize)
    labels = connected_components(edges, pointer_jump=True, max_rounds=30)
    ent = labels.select(
        F.col("node").alias("member_id"),
        F.col("lab").cast("bigint").alias("entity_id"),
    )
    return ent.withColumn(
        "n_members",
        F.count(F.lit(1)).over(W.partitionBy("entity_id")).cast("bigint"),
    )


# ---------------------------------------------------------------------------
# survivorship — the GOLDEN RECORD per resolved entity
# ---------------------------------------------------------------------------


def _survivorship_oracle() -> str:
    return f"""
    WITH ent AS ({_er_cluster_oracle()}),
    clean AS ({_fs_records_sql()}),
    dirty AS ({_fs_dirty_sql()}),
    members AS (
      SELECT c_custkey AS member_id, 0 AS src_rank, name, phone,
             CAST(city AS BIGINT) AS city
      FROM clean
      UNION ALL
      SELECT rid + {ER_NODE_OFFSET} AS member_id, 1 AS src_rank, name, phone,
             CAST(city AS BIGINT) AS city
      FROM dirty
    ),
    m AS (
      SELECT e.entity_id, mm.member_id, mm.src_rank, mm.name, mm.phone,
             mm.city
      FROM ent e JOIN members mm ON mm.member_id = e.member_id
    ),
    rep AS (
      SELECT entity_id, name,
             row_number() OVER (PARTITION BY entity_id
                                ORDER BY src_rank ASC, member_id ASC) AS rn
      FROM m
    ),
    ph AS (
      SELECT entity_id, phone,
             row_number() OVER (PARTITION BY entity_id
                                ORDER BY count(*) DESC, phone ASC) AS rn
      FROM m GROUP BY entity_id, phone
    ),
    ci AS (
      SELECT entity_id, city,
             row_number() OVER (PARTITION BY entity_id
                                ORDER BY count(*) DESC, city ASC) AS rn
      FROM m GROUP BY entity_id, city
    ),
    agg AS (
      SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(CASE WHEN src_rank = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clean,
             CAST(sum(CASE WHEN src_rank = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dirty
      FROM m GROUP BY 1
    )
    SELECT agg.entity_id, agg.n_members, agg.n_clean, agg.n_dirty,
           rep.name AS golden_name, ph.phone AS golden_phone,
           ci.city AS golden_city
    FROM agg JOIN rep ON rep.entity_id = agg.entity_id AND rep.rn = 1
             JOIN ph  ON ph.entity_id  = agg.entity_id AND ph.rn  = 1
             JOIN ci  ON ci.entity_id  = agg.entity_id AND ci.rn  = 1
    """


@register("er_survivorship", _survivorship_oracle())
def er_survivorship(spark, sf_dir):
    """Survivorship — the GOLDEN-RECORD construction that ends every MDM
    entity-resolution pipeline (block → decide → cluster → SURVIVE): per
    resolved entity, one canonical record assembled from its members
    under explicit, deterministic precedence rules. Name survives by
    SOURCE PRIORITY (the curated clean roster outranks dirty re-entries;
    ties fall to the lowest member id — 'most trusted source' in
    Talend/Informatica survivorship terms); phone and city survive by
    MOST-FREQUENT VALUE with a lexicographic tie-break ('majority rules'
    — corroboration across members beats any single source). Every rule
    is a total order, so the golden record is unique and reproducible —
    the property that separates survivorship from 'pick any': an MDM
    rerun that flips golden values on unchanged input is unauditable.
    Member counts per source ride along as the review signal.

    Scale shape: the member-attribute join is node-keyed on member_id
    (entity labels come from the pointer-jumping components run —
    er_cluster_entities' machinery, shared lineage); the three
    survivorship picks are entity-keyed window row_numbers over
    entity-sized groups (members per entity is small by construction —
    match-decision fan-in, not corpus fan-in), and the frequency picks
    pre-collapse to (entity, value) grids map-side before ranking. At
    100 TB nothing here is data-sized except the one members join; the
    windows run on grids bounded by the entity count. The oracle
    recomputes the identical picks over the recursive-closure entity
    table."""
    ent = er_cluster_entities(spark, sf_dir).select("member_id", "entity_id")
    clean, dirty = _fs_rosters(spark, sf_dir)
    members = clean.select(
        F.col("c_custkey").alias("member_id"),
        F.lit(0).alias("src_rank"),
        "name",
        "phone",
        F.col("city").cast("bigint").alias("city"),
    ).unionAll(
        dirty.select(
            (F.col("rid") + ER_NODE_OFFSET).alias("member_id"),
            F.lit(1).alias("src_rank"),
            "name",
            "phone",
            F.col("city").cast("bigint").alias("city"),
        )
    )
    # entity_id-prepartition before the checkpoint: all four consumers
    # (three survivorship windows/grids + the member-count aggregate) and
    # the three final joins cluster on entity_id, so the stored
    # HashPartitioning satisfies every downstream ClusteredDistribution
    # (incl. the (entity_id, value) grids — partitioning on a key prefix
    # clusters the superset) and ONE shuffle replaces four
    m = ent.join(members, "member_id").repartition("entity_id").transform(materialize)
    rep = (
        m.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("entity_id").orderBy(
                    F.asc("src_rank"), F.asc("member_id")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("entity_id", F.col("name").alias("golden_name"))
    )
    ph = (
        m.groupBy("entity_id", "phone")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("entity_id").orderBy(
                    F.desc("cnt"), F.asc("phone")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("entity_id", F.col("phone").alias("golden_phone"))
    )
    ci = (
        m.groupBy("entity_id", "city")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("entity_id").orderBy(F.desc("cnt"), F.asc("city"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("entity_id", F.col("city").alias("golden_city"))
    )
    agg = m.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum(F.when(F.col("src_rank") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_clean"),
        F.sum(F.when(F.col("src_rank") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dirty"),
    )
    return (
        agg.join(rep, "entity_id")
        .join(ph, "entity_id")
        .join(ci, "entity_id")
        .select(
            "entity_id",
            "n_members",
            "n_clean",
            "n_dirty",
            "golden_name",
            "golden_phone",
            "golden_city",
        )
    )


# ---------------------------------------------------------------------------
# blocking-scheme evaluation — reduction ratio × pairs completeness
# ---------------------------------------------------------------------------


def _blocking_metrics_oracle() -> str:
    return f"""
    WITH clean AS ({_fs_records_sql()}),
    dirty AS ({_fs_dirty_sql()}),
    tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM dirty) AS n_dirty,
                   (SELECT CAST(count(*) AS BIGINT) FROM clean) AS n_clean),
    truth AS (
      SELECT d.name AS dn, d.phone AS dp, d.city AS dc,
             c.name AS cn, c.phone AS cp, c.city AS cc
      FROM dirty d JOIN clean c ON c.c_custkey = d.rid
    ),
    cand AS (
      SELECT 'phone_prefix2' AS scheme, CAST(count(*) AS BIGINT) AS n_candidates
      FROM dirty d JOIN clean c ON substr(d.phone, 1, 2) = substr(c.phone, 1, 2)
      UNION ALL
      SELECT 'city', CAST(count(*) AS BIGINT)
      FROM dirty d JOIN clean c ON d.city = c.city
      UNION ALL
      SELECT 'name_exact', CAST(count(*) AS BIGINT)
      FROM dirty d JOIN clean c ON d.name = c.name
    ),
    found AS (
      SELECT 'phone_prefix2' AS scheme, CAST(count(*) AS BIGINT) AS true_found
      FROM truth WHERE substr(dp, 1, 2) = substr(cp, 1, 2)
      UNION ALL
      SELECT 'city', CAST(count(*) AS BIGINT) FROM truth WHERE dc = cc
      UNION ALL
      SELECT 'name_exact', CAST(count(*) AS BIGINT) FROM truth WHERE dn = cn
    )
    SELECT cand.scheme, tot.n_dirty AS n_true_pairs, cand.n_candidates,
           round(1 - CAST(cand.n_candidates AS DOUBLE)
                     / (CAST(tot.n_dirty AS DOUBLE)
                        * CAST(tot.n_clean AS DOUBLE)), 6) AS reduction_ratio,
           found.true_found,
           round(CAST(found.true_found AS DOUBLE)
                 / CAST(tot.n_dirty AS DOUBLE), 6) AS pairs_completeness
    FROM cand JOIN found USING (scheme) CROSS JOIN tot
    """


@register("er_blocking_metrics", _blocking_metrics_oracle())
def er_blocking_metrics(spark, sf_dir):
    """BLOCKING-SCHEME EVALUATION — the analysis every ER deployment
    runs before linking (Splink's blocking-rule profiler; Christen's
    RR/PC framework): for each candidate blocking rule, the two numbers
    that trade off against each other — REDUCTION RATIO (1 − candidate
    pairs / all pairs: how much of the quadratic the rule kills) and
    PAIRS COMPLETENESS (what fraction of TRUE matches survive blocking:
    recall of the candidate generator; the ceiling on any downstream
    matcher). Ground truth is the FS fixture's planted identity (dirty
    rid ≡ clean custkey). Three rules with designed contrast: the 2-hex
    phone prefix (the one er_fellegi_sunter ships: corruptions never
    touch positions 1–2, so PC = 1.0 with RR ~ 255/256), city equality
    (the %12 city-moved plants escape the block — PC < 1, the
    silent-loss failure a profiler exists to expose), and exact name
    (only the %12 == 0 uncorrupted plants survive — high RR, terrible
    PC). Counts are exact int64; the two ratios divide exact integers
    LAST, round(6)ed.

    Scale shape: each rule is ONE equi-join COUNT on its blocking key
    (AQE-sized hash joins; nothing materializes the pairs — count
    partials collapse map-side) and truth-pair recall is a key-join +
    conditional count over the roster. The rosters build once from the
    shared checkpoint (_fs_rosters). At 100 TB the profiler costs one
    pass per rule over the blocked join — exactly what it costs in
    production, which is why RR exists as a planning number."""
    clean, dirty = _fs_rosters(spark, sf_dir)
    n_dirty = dirty.agg(F.count(F.lit(1)).cast("bigint").alias("n_dirty"))
    n_clean = clean.agg(F.count(F.lit(1)).cast("bigint").alias("n_clean"))
    tot = n_dirty.crossJoin(n_clean)
    d = dirty.alias("d")
    c = clean.alias("c")
    truth = d.join(c, F.expr("c.c_custkey = d.rid")).select(
        F.col("d.name").alias("dn"),
        F.col("d.phone").alias("dp"),
        F.col("d.city").alias("dc"),
        F.col("c.name").alias("cn"),
        F.col("c.phone").alias("cp"),
        F.col("c.city").alias("cc"),
    )

    def _count(df, scheme):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        ).select(F.lit(scheme).alias("scheme"), "cnt")

    cand = (
        _count(
            d.join(c, F.expr("substr(d.phone, 1, 2) = substr(c.phone, 1, 2)")),
            "phone_prefix2",
        )
        .unionByName(_count(d.join(c, F.expr("d.city = c.city")), "city"))
        .unionByName(
            _count(d.join(c, F.expr("d.name = c.name")), "name_exact")
        )
        .withColumnRenamed("cnt", "n_candidates")
    )
    found = (
        _count(
            truth.filter(F.expr("substr(dp, 1, 2) = substr(cp, 1, 2)")),
            "phone_prefix2",
        )
        .unionByName(_count(truth.filter(F.expr("dc = cc")), "city"))
        .unionByName(_count(truth.filter(F.expr("dn = cn")), "name_exact"))
        .withColumnRenamed("cnt", "true_found")
    )
    return (
        cand.join(found, "scheme")
        .crossJoin(F.broadcast(tot))
        .select(
            "scheme",
            F.col("n_dirty").alias("n_true_pairs"),
            "n_candidates",
            F.round(
                1
                - F.col("n_candidates").cast("double")
                / (
                    F.col("n_dirty").cast("double")
                    * F.col("n_clean").cast("double")
                ),
                6,
            ).alias("reduction_ratio"),
            "true_found",
            F.round(
                F.col("true_found").cast("double")
                / F.col("n_dirty").cast("double"),
                6,
            ).alias("pairs_completeness"),
        )
    )
