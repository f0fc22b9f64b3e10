"""Training-data curation operators [EXT] — the north-star LLM-pipeline
steps downstream of dedup/quality metrics: the quality GATE, token-budget
sequence packing, and deterministic source mixing.

All three are exact and hash-free-deterministic, so they carry full DuckDB
oracles despite being \"ML ops\" — the curation decisions a 100 TB run
makes must be reproducible run-to-run or the dataset is unauditable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from xml_to_parquet_spark.functions.text_fns import TOKENS_DUCK, TOKENS_SQL
from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.tables import table
from xml_to_parquet_spark.materialize import materialize

SEQ_BUDGET = 512  # tokens per packed training sequence


@register(
    "curate_quality_filter",
    f"""
    WITH tok AS (SELECT doc_id, source, {TOKENS_DUCK} AS toks FROM documents),
    m AS (
      SELECT doc_id, source,
             len(toks) AS n_tokens,
             list_sum(list_transform(toks, t -> length(t)))
                 / CAST(len(toks) AS DOUBLE) AS avg_tok,
             len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS ttr
      FROM tok WHERE len(toks) > 0
    )
    SELECT doc_id, source, n_tokens
    FROM m
    WHERE n_tokens BETWEEN 25 AND 2000
      AND avg_tok BETWEEN 2.0 AND 12.0
      AND ttr >= 0.35
    """,
)
def curate_quality_filter(spark, sf_dir):
    """Gopher/C4-style quality gate: token-count bounds, average token
    length bounds, type-token-ratio floor. One map-only pass; the gate is
    pure column arithmetic so it composes with any upstream filter at the
    scan (no UDF, no shuffle)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(TOKENS_SQL).alias("toks")
    )
    n = F.size("toks")
    avg_tok = F.expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))") / n.cast(
        "double"
    )
    ttr = F.size(F.array_distinct("toks")) / n.cast("double")
    return (
        docs.filter(n > 0)
        .filter(
            n.between(25, 2000)
            & avg_tok.between(2.0, 12.0)
            & (ttr >= 0.35)
        )
        .select("doc_id", "source", n.alias("n_tokens"))
    )


@register(
    "curate_pack_sequences",
    f"""
    WITH tok AS (
      SELECT doc_id, len({TOKENS_DUCK}) AS n_tokens FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                 AS cum_before
      FROM tok WHERE n_tokens > 0
    )
    SELECT doc_id, n_tokens,
           CAST(cum_before // {SEQ_BUDGET} AS BIGINT) AS seq_id
    FROM c
    """,
)
def curate_pack_sequences(spark, sf_dir):
    """Sequence packing: assign docs (in stable doc_id order) to training
    sequences of ~{budget} tokens via exclusive-cumsum division — the
    deterministic contiguous packing used to batch pretraining data.

    Scale note: the global-order cumsum means one window partition; at
    100 TB use curate_pack_sharded below — the shipped sharded twin
    (partitionBy(shard) window + per-shard seq-id offsets), same
    expression, embarrassingly parallel, at the cost of at most one
    underfull sequence per shard. This global variant stays as the
    tiny-scale semantic cross-check."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.expr(TOKENS_SQL)).alias("n_tokens")
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    return (
        docs.filter(F.col("n_tokens") > 0)
        .withColumn("cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"cum_before div {SEQ_BUDGET}").cast("bigint").alias("seq_id"),
        )
    )


N_PACK_SHARDS = 8  # deterministic shard fan-out for the scale packing path


@register(
    "curate_pack_sharded",
    f"""
    WITH tok AS (
      SELECT doc_id, len({TOKENS_DUCK}) AS n_tokens FROM documents
    ), t AS (
      SELECT doc_id, n_tokens, CAST(doc_id % {N_PACK_SHARDS} AS INT) AS shard
      FROM tok WHERE n_tokens > 0
    ), c AS (
      SELECT doc_id, n_tokens, shard,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                 AS cum_before
      FROM t
    ), s AS (
      SELECT shard,
             CAST((sum(n_tokens) - max_by(n_tokens, doc_id))
                  // {SEQ_BUDGET} AS BIGINT) + 1 AS n_seq
      FROM t GROUP BY shard
    ), o AS (
      SELECT s.shard,
             CAST(coalesce(sum(b.n_seq), 0) AS BIGINT) AS seq_offset
      FROM s LEFT JOIN s b ON b.shard < s.shard
      GROUP BY s.shard
    )
    SELECT c.doc_id, c.n_tokens, c.shard,
           CAST(o.seq_offset
                + CAST(cum_before // {SEQ_BUDGET} AS BIGINT)
                AS BIGINT) AS seq_id
    FROM c JOIN o USING (shard)
    """,
)
def curate_pack_sharded(spark, sf_dir):
    """Sequence packing at scale: the sharded twin of curate_pack_sequences
    (VERDICT r14 #2 — retires the engine's last single-partition window).

    curate_pack_sequences packs in ONE global doc_id order, which Spark
    executes as a single window partition — a one-reducer bottleneck at
    100 TB. This twin packs WITHIN deterministic shards
    (shard = doc_id % {N_PACK_SHARDS}) and then makes the ids globally
    unique and gap-free with per-shard sequence-count prefix offsets:

      pass 1  window partitionBy(shard) orderBy(doc_id): exclusive cumsum
              -> local_seq = floor(cum_before / budget). Embarrassingly
              parallel — the shuffle is hashpartitioning(shard) and every
              shard packs independently.
      pass 2  ONE combinable groupBy(shard) computes each shard's exact
              sequence count n_seq = floor((sum - last_doc_tokens)/budget)+1
              (gap-free: equals max(local_seq)+1 without re-running the
              window), then the exclusive prefix offsets come from a
              triangular broadcast self-join over the SHARD-COUNT-row
              summary (bounded by {N_PACK_SHARDS}², never by data — the
              bounded-broadcast-NLJ device the plan-smell gate blesses;
              deliberately NOT a window, so NO single-partition WindowExec
              exists anywhere in this plan) that broadcast-joins back:
              seq_id = seq_offset + local_seq.

    Semantics match the global packer shard-wise: a doc straddling a budget
    boundary lands in the floor bucket; the cost of sharding is at most one
    underfull sequence per shard. Deterministic and exact (all int64):
    both bucket divisions run as integer `div`, never floor(x / y)
    through double — a double mantissa mis-buckets once a shard's
    cumulative token count exceeds 2^53, exactly the regime the sharded
    path exists for (ADVICE r16; the oracle's `//` matches). The
    curation decisions a 100 TB run makes must be reproducible.

    Scale shape: one data shuffle (by shard), one map-side-combinable
    aggregate, one broadcast of {N_PACK_SHARDS} rows. At 1000 executors
    raise N_PACK_SHARDS to O(cores); nothing else changes.
    """
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.expr(TOKENS_SQL)).alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(N_PACK_SHARDS)).cast("int")
        )
    )
    sw = W.partitionBy("shard").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    local = docs.withColumn(
        "cum_before", F.sum("n_tokens").over(sw) - F.col("n_tokens")
    ).withColumn(
        # `div` is int64 division end-to-end (ADVICE r16: floor(x / y)
        # routes through double, whose 2^53 mantissa would silently
        # mis-bucket once a shard's cumulative token count outgrows it —
        # cum_before >= 0 so truncating div IS floor; the oracle's
        # DuckDB `//` matches)
        "local_seq",
        F.expr(f"cum_before div {SEQ_BUDGET}").cast("bigint"),
    )
    counts = docs.groupBy("shard").agg(
        F.sum("n_tokens").alias("tok_sum"),
        F.max_by("n_tokens", "doc_id").alias("last_doc_tokens"),
    ).select(
        "shard",
        (
            F.expr(f"(tok_sum - last_doc_tokens) div {SEQ_BUDGET}")
            + F.lit(1)
        )
        .cast("bigint")
        .alias("n_seq"),
    )
    # The summary feeds BOTH sides of the triangular join; checkpoint the
    # {N_PACK_SHARDS}-row result so the corpus isn't scanned once per side
    # (the er_survivorship one-checkpoint-many-consumers device).
    counts = counts.transform(materialize)
    below = counts.select(
        F.col("shard").alias("b_shard"), F.col("n_seq").alias("b_n_seq")
    )
    offsets = (
        counts.join(
            F.broadcast(below), F.col("b_shard") < F.col("shard"), "left"
        )
        .groupBy("shard")
        .agg(
            F.coalesce(F.sum("b_n_seq"), F.lit(0))
            .cast("bigint")
            .alias("seq_offset")
        )
    )
    return (
        local.join(
            F.broadcast(offsets.select("shard", "seq_offset")), "shard"
        )
        .select(
            "doc_id",
            "n_tokens",
            "shard",
            (F.col("seq_offset") + F.col("local_seq")).alias("seq_id"),
        )
    )


# deterministic per-source sampling weights (percent kept)
MIX_WEIGHTS = {"src0": 100, "src1": 50, "src2": 25, "src3": 10}
MIX_DEFAULT = 75


@register(
    "curate_mix_sources",
    f"""
    WITH w AS (
      SELECT doc_id, source,
             CASE source
                  WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
                  WHEN 'src2' THEN 25  WHEN 'src3' THEN 10
                  ELSE {MIX_DEFAULT} END AS keep_pct
      FROM documents
    )
    SELECT doc_id, source FROM w
    WHERE (doc_id * 2654435761) % 100 < keep_pct
    """,
)
def curate_mix_sources(spark, sf_dir):
    """Deterministic domain mixing: per-source keep-rates applied via a
    Knuth-hash of the stable doc id — reproducible (re-running selects the
    same docs, unlike RNG sampling) and shuffle-free. This is how mixture
    weights (web 50%, code 25%, ...) are applied to a 100 TB corpus
    without materializing per-source splits."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    keep = F.when(F.col("source") == "src0", 100)
    for src, pct in list(MIX_WEIGHTS.items())[1:]:
        keep = keep.when(F.col("source") == src, pct)
    keep = keep.otherwise(MIX_DEFAULT)
    return docs.filter((F.col("doc_id") * 2654435761) % 100 < keep).select(
        "doc_id", "source"
    )


def _keep_best_oracle() -> str:
    from xml_to_parquet_spark.operators.dedup import _components_oracle

    comps = _components_oracle()
    return f"""
    WITH comp AS ({comps}),
    tok AS (
      SELECT doc_id, len({TOKENS_DUCK}) AS n_tokens FROM documents
    ), ranked AS (
      SELECT c.component, c.doc_id, t.n_tokens,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY t.n_tokens DESC, c.doc_id) AS rn
      FROM comp c JOIN tok t ON t.doc_id = c.doc_id
    )
    SELECT component,
           min(CASE WHEN rn = 1 THEN doc_id END) AS keeper_id,
           count(*) AS n_members
    FROM ranked GROUP BY component
    """


@register("curate_dedup_keep_best", _keep_best_oracle())
def curate_dedup_keep_best(spark, sf_dir):
    """The dedup pipeline capstone, composed end-to-end: MinHash-LSH
    candidates → connected components → keep the highest-quality member
    (longest, doc_id tiebreak) per duplicate cluster. Each stage is the
    already-verified operator; the composition stays a single lazy plan
    until the iterative component loop materializes its fixpoint."""
    from xml_to_parquet_spark.operators.dedup import dedup_components

    comps = dedup_components(spark, sf_dir)
    tok = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.expr(TOKENS_SQL)).alias("n_tokens")
    )
    w = W.partitionBy("component").orderBy(F.desc("n_tokens"), "doc_id")
    ranked = comps.join(tok, "doc_id").withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("component").agg(
        F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


def _contamination_oracle() -> str:
    from xml_to_parquet_spark.functions.text_fns import shingles_duck

    return f"""
    WITH tok AS (
      SELECT doc_id, source, {TOKENS_DUCK} AS toks FROM documents
    ), sh AS (
      SELECT doc_id, source,
             unnest(list_distinct({shingles_duck(4)})) AS g
      FROM tok WHERE len(toks) >= 4
    ), train AS (SELECT doc_id, g FROM sh WHERE source <> 'src19'),
       eval_set AS (SELECT DISTINCT doc_id, g FROM sh WHERE source = 'src19')
    SELECT t.doc_id AS train_doc,
           count(DISTINCT e.doc_id) AS n_eval_hits,
           count(DISTINCT t.g)      AS n_shared_grams
    FROM train t JOIN eval_set e ON t.g = e.g
    GROUP BY t.doc_id
    """


@register("curate_decontaminate", _contamination_oracle())
def curate_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing any
    4-gram with the held-out eval set (here: source src19). The join is
    shingle-keyed — cost scales with shared-gram count, never
    |train|×|eval|; at 100 TB the eval side's distinct grams are small
    enough to BROADCAST, making the whole check map-side."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(TOKENS_SQL).alias("toks")
    )
    from xml_to_parquet_spark.functions.text_fns import shingles_sql

    # r16-opt (guide §2.4): train and eval are complementary source
    # filters over the same exploded shingle stream, so the scan +
    # tokenize + 13-gram shingle build ran twice as one lazy subtree
    # (before-plan: 4 FileScans). Checkpoint the COMPACT per-doc shingle
    # arrays (pre-explode — the unigram_lm rule: materializing the
    # exploded rows would cost more than the map-only explode recompute)
    # and explode per consumer; the expensive build runs once.
    gs = (
        docs.filter(F.size("toks") >= 4)
        .select(
            "doc_id",
            "source",
            F.array_distinct(F.expr(shingles_sql(4))).alias("gs"),
        )
        .transform(materialize)
    )
    sh = gs.select("doc_id", "source", F.explode("gs").alias("g"))
    train = sh.filter(F.col("source") != "src19").select("doc_id", "g")
    eval_set = (
        sh.filter(F.col("source") == "src19")
        .select(F.col("doc_id").alias("eval_doc"), "g")
        .distinct()
    )
    return (
        train.join(F.broadcast(eval_set), "g")
        .groupBy(F.col("doc_id").alias("train_doc"))
        .agg(
            F.countDistinct("eval_doc").alias("n_eval_hits"),
            F.countDistinct("g").alias("n_shared_grams"),
        )
    )


CHUNK_SEQ_BUDGET = 512


def _pack_chunks_oracle() -> str:
    # curation imports before text in load_all(); importing the module here
    # runs text's registrations so the chunking oracle is available
    from xml_to_parquet_spark.operators import text  # noqa: F401
    from xml_to_parquet_spark.registry import REGISTRY

    chunk_sql = REGISTRY["text_chunk_overlap"].oracle
    return f"""
    WITH chunks AS ({chunk_sql}),
    c AS (
      SELECT doc_id, chunk_idx, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                 AS cum_before
      FROM chunks
    ), assigned AS (
      SELECT doc_id, n_tokens,
             CAST(cum_before // {CHUNK_SEQ_BUDGET} AS BIGINT) AS seq_id
      FROM c
    )
    SELECT seq_id, count(*) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           count(DISTINCT doc_id) AS n_docs
    FROM assigned GROUP BY seq_id
    """


@register("curate_pack_chunks", _pack_chunks_oracle())
def curate_pack_chunks(spark, sf_dir):
    """Capstone composition: context-window chunking (text_chunk_overlap)
    feeding sequence packing — chunks assigned in stable (doc, chunk)
    order to ~512-token training sequences by exclusive-cumsum division,
    then summarized per sequence. This is the chunk-granular packer a
    pretraining pipeline runs after sub-document dedup: boundaries land
    between overlapping windows instead of mid-document, so no sample
    loses its local context. Same shard-parallel scale note as
    curate_pack_sequences."""
    from xml_to_parquet_spark.operators.text import text_chunk_overlap

    chunks = text_chunk_overlap(spark, sf_dir)
    w = W.orderBy("doc_id", "chunk_idx").rowsBetween(W.unboundedPreceding, 0)
    assigned = chunks.withColumn(
        "cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).select(
        "doc_id",
        "n_tokens",
        F.expr(f"cum_before div {CHUNK_SEQ_BUDGET}").cast("bigint").alias("seq_id"),
    )
    return assigned.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


MIX_ALPHA = 0.5  # temperature exponent: 1 = proportional, 0 = uniform


@register(
    "curate_mix_temperature",
    f"""
    WITH s AS (SELECT source, count(*) AS n_docs,
                      CAST(sum(n_chars) AS BIGINT) AS n_chars
               FROM documents GROUP BY source),
         t AS (SELECT sum(n_docs ^ {MIX_ALPHA}) AS z FROM s)
    SELECT source, n_docs, n_chars,
           round(n_docs ^ {MIX_ALPHA} / z, 4)              AS mix_weight,
           round(n_docs ^ {MIX_ALPHA} / z /
                 (n_docs / (SELECT sum(n_docs) FROM s)), 4) AS upsample_factor
    FROM s CROSS JOIN t
    """,
)
def curate_mix_temperature(spark, sf_dir):
    """Temperature-scaled source mixing (the multilingual/multi-source
    sampling scheme from the XLM-R / mT5 lineage): source weight ∝
    count^α with α=0.5, normalized — small sources are upsampled, head
    sources downsampled, and ``upsample_factor`` is the ratio each
    source's sampling rate changes vs proportional.

    Scale shape: one map-side-combinable aggregate to |sources| rows, then
    driver-free scalar normalization via a broadcast 1-row crossJoin —
    the whole query exchanges O(|sources|) rows regardless of corpus
    size."""
    docs = table(spark, sf_dir, "documents")
    # r16-opt (guide §2.4): the per-source grid feeds the normalizer
    # aggregate AND the crossJoin — lazy, the documents pass ran twice
    # (before-plan: 4 FileScans). Checkpoint the |sources|-row grid.
    s = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .transform(materialize)
    )
    t = s.agg(
        F.sum(F.pow("n_docs", MIX_ALPHA)).alias("z"),
        F.sum("n_docs").alias("total"),
    )
    w = F.pow("n_docs", MIX_ALPHA) / F.col("z")
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_chars",
        F.round(w, 4).alias("mix_weight"),
        F.round(w / (F.col("n_docs") / F.col("total")), 4).alias("upsample_factor"),
    )


# ---------------------------------------------------------------------------
# tokenizer-faithful packing (real BPE, broadcast merges table)
# ---------------------------------------------------------------------------

# A fixed, ordered BPE merge list (published-style: rank = priority, lower
# merges first). A stand-in for a trained tokenizer's merges.txt — the
# ALGORITHM (iterated lowest-rank adjacent-pair merge, all occurrences per
# round) is exactly GPT-2's; swapping in a real 50k-merge file changes the
# broadcast payload, not the code.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "n"),
    ("e", "r"), ("o", "r"), ("a", "r"), ("s", "t"), ("l", "o"),
    ("a", "t"), ("r", "o"), ("e", "n"), ("o", "u"), ("le", "s"),
    ("an", "d"), ("in", "g"), ("e", "y"), ("k", "ey"), ("u", "e"),
    ("q", "u"), ("qu", "er"), ("quer", "y"), ("s", "p"), ("sp", "ar"),
    ("spar", "k"), ("j", "o"), ("jo", "in"), ("d", "a"), ("da", "ta"),
    ("t", "a"), ("s", "c"), ("sc", "an"), ("h", "a"), ("ha", "s"),
    ("has", "h"), ("b", "a"), ("ba", "t"), ("bat", "c"), ("batc", "h"),
    ("g", "ro"), ("gro", "u"), ("grou", "p"), ("f", "i"), ("fi", "l"),
    ("fil", "t"), ("filt", "er"), ("w", "in"), ("win", "d"), ("wind", "o"),
    ("windo", "w"), ("m", "er"), ("mer", "g"), ("merg", "e"), ("v", "a"),
    ("va", "l"), ("val", "ue"), ("c", "o"), ("co", "l"), ("col", "u"),
    ("colu", "m"), ("colum", "n"), ("s", "m"), ("sm", "a"), ("sma", "l"),
    ("smal", "l"), ("o", "rd"), ("ord", "er"), ("r", "o"), ("ro", "w"),
    ("t", "ab"), ("tab", "le"), ("s", "or"), ("sor", "t"), ("f", "a"),
    ("fa", "st"), ("s", "lo"), ("slo", "w"), ("li", "n"), ("lin", "e"),
    ("l", "i"), ("b", "i"), ("bi", "g"), ("v", "e"), ("ve", "c"),
    ("vec", "t"), ("vect", "or"), ("c", "u"), ("cu", "st"), ("cust", "o"),
    ("custo", "m"), ("custom", "er"), ("st", "re"), ("stre", "a"),
    ("strea", "m"), ("a", "g"), ("ag", "g"), ("p", "ar"), ("par", "t"),
]
BPE_RANKS: dict[tuple[str, str], int] = {p: i for i, p in enumerate(BPE_MERGES)}


def bpe_token_count(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Reference BPE encode (returns the token count): start from
    characters, repeatedly merge ALL occurrences of the lowest-rank
    adjacent pair until no pair is mergeable — GPT-2's algorithm."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        a, b = BPE_MERGES[best_rank]
        out = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


@register("curate_pack_bpe", None)  # rows-only: BPE's data-dependent merge
# loop has no SQL form; parity is proven by tests/test_new_ops_r7.py, which
# recomputes every count with the pure-Python reference encoder
def curate_pack_bpe(spark, sf_dir):
    """Tokenizer-faithful sequence packing: documents are measured in REAL
    BPE tokens (not the whitespace/regex proxies the other curate_* ops
    use) and packed into ~SEQ_BUDGET-token training sequences with the
    same exclusive-cumsum packer as curate_pack_sequences. Training-data
    packing is budgeted in tokenizer tokens; a whitespace proxy misbudgets
    short-word-heavy corpora by 2-4×.

    Scale shape: the merges table is an explicit SparkContext broadcast
    (the real pattern for a 50k-merge tokenizer — ship the model to the
    data); encoding runs in an Arrow-batched pandas UDF (the merge loop is
    data-dependent iteration — genuinely inexpressible in builtin
    expressions, the sanctioned Python crossing), map-only until the
    packer's single global-order window (shard the window at 100 TB, same
    note as curate_pack_sequences)."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(BPE_RANKS)

    @pandas_udf("long")
    def n_bpe(texts: pd.Series) -> pd.Series:
        ranks = bc.value
        return texts.map(
            lambda t: sum(bpe_token_count(w, ranks) for w in t.lower().split())
        )

    docs = (
        table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", n_bpe("text").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    return (
        docs.withColumn("cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"cum_before div {SEQ_BUDGET}").cast("bigint").alias("seq_id"),
        )
    )


@register(
    "curate_pipeline",
    f"""
    WITH tok AS (
      SELECT doc_id, source, text, {TOKENS_DUCK} AS toks FROM documents
    ), gated AS (
      SELECT doc_id, source, text, len(toks) AS n_tokens
      FROM tok
      WHERE len(toks) BETWEEN 25 AND 2000
        AND list_sum(list_transform(toks, t -> length(t)))
            / CAST(len(toks) AS DOUBLE) BETWEEN 2.0 AND 12.0
        AND len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) >= 0.35
    ), deduped AS (
      SELECT doc_id, source, n_tokens,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY doc_id) AS rn
      FROM gated
    ), mixed AS (
      SELECT doc_id, source, n_tokens FROM deduped
      WHERE rn = 1
        AND (doc_id * 2654435761) % 100 <
            CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
                        WHEN 'src2' THEN 25  WHEN 'src3' THEN 10
                        ELSE {MIX_DEFAULT} END
    ), packed AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens AS cum_before
      FROM mixed
    )
    SELECT doc_id, source, n_tokens,
           CAST(cum_before // {SEQ_BUDGET} AS BIGINT) AS seq_id
    FROM packed
    """,
)
def curate_pipeline(spark, sf_dir):
    """The END-TO-END curation pipeline as ONE declarative plan — the
    sequence every pretraining data pass runs: quality gate (Gopher/C4
    bounds) → exact dedup keep-first (md5 groups, lowest doc_id survives)
    → deterministic source mixing (Knuth-hash keep rates) → token-budget
    sequence packing. Each stage exists as its own registered operator
    (curate_quality_filter / dedup_exact / curate_mix_sources /
    curate_pack_sequences); this entry proves they COMPOSE — Catalyst
    fuses the gate and the mix filter into the scan-side pipeline, the
    dedup is one digest-keyed window, and only the final global-order
    cumsum is a single-partition window (shard it at 100 TB exactly as
    curate_pack_sequences documents).

    The gate runs BEFORE dedup (cheap map-side filter shrinks the digest
    shuffle); the mix runs after dedup so mixture rates apply to unique
    documents — the order production pipelines use."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.expr(TOKENS_SQL).alias("toks")
    )
    n = F.size("toks")
    avg_tok = F.expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))") / n.cast(
        "double"
    )
    ttr = F.size(F.array_distinct("toks")) / n.cast("double")
    gated = docs.filter(
        n.between(25, 2000) & avg_tok.between(2.0, 12.0) & (ttr >= 0.35)
    ).select("doc_id", "source", "text", n.alias("n_tokens"))
    dw = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") == 1)
        .drop("rn", "text")
    )
    keep = F.when(F.col("source") == "src0", 100)
    for src, pct in list(MIX_WEIGHTS.items())[1:]:
        keep = keep.when(F.col("source") == src, pct)
    keep = keep.otherwise(MIX_DEFAULT)
    mixed = deduped.filter((F.col("doc_id") * 2654435761) % 100 < keep)
    pw = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    return (
        mixed.withColumn(
            "cum_before", F.sum("n_tokens").over(pw) - F.col("n_tokens")
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr(f"cum_before div {SEQ_BUDGET}").cast("bigint").alias("seq_id"),
        )
    )


# ---------------------------------------------------------------------------
# distributed BPE TRAINING (vocabulary induction — the other half of
# curate_pack_bpe's encoder)
# ---------------------------------------------------------------------------

BPE_TRAIN_MERGES = 12  # merges to learn


def _apply_merge_expr(a: str, b: str, col):
    """JVM-side expression applying ONE learned merge to symbol arrays
    (all occurrences, greedy left-to-right with skip-2 on match — GPT-2's
    training-side rule), as an aggregate() fold carrying
    struct(out: merged-so-far, prev: last unmerged symbol). A just-merged
    token clears prev, so it can never re-merge with the next element —
    exactly the greedy-skip semantics of the pandas-UDF formulation this
    replaced. Symbols are never empty (words are length-filtered and
    merges concatenate), so '' is a safe no-pending sentinel. Moving the
    rewrite into the JVM removes one ArrowEvalPython stage PER ROUND —
    with 12 rounds and a 3-round checkpoint cadence the recompute window
    stacked up to 3 Python crossings per job; the fold keeps the whole
    round plan in one JVM stage (measured ~8.4s → ~4.0s at sf0.1). The
    learned pair is passed as lit() columns, never interpolated into SQL
    text — symbols come from corpus text and may contain quotes."""
    merged = F.lit(a + b)
    la, lb, empty = F.lit(a), F.lit(b), F.lit("")
    init = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("out"),
        empty.alias("prev"),
    )

    def step(acc, x):
        return (
            F.when(
                (acc["prev"] == la) & (x == lb),
                F.struct(
                    F.array_append(acc["out"], merged).alias("out"),
                    F.lit("").alias("prev"),
                ),
            )
            .when(
                acc["prev"] == F.lit(""),
                F.struct(acc["out"].alias("out"), x.alias("prev")),
            )
            .otherwise(
                F.struct(
                    F.array_append(acc["out"], acc["prev"]).alias("out"),
                    x.alias("prev"),
                )
            )
        )

    def fin(acc):
        return F.when(acc["prev"] == F.lit(""), acc["out"]).otherwise(
            F.array_append(acc["out"], acc["prev"])
        )

    return F.aggregate(col, init, step, fin)


@register("text_bpe_train", None)  # rows-only: iterative argmax training
# has no SQL form; tests/test_new_ops_r7.py proves exact equality with a
# pure-python reference trainer over the same corpus
def text_bpe_train(spark, sf_dir):
    """Distributed BPE vocabulary induction — the TRAINING half of the
    tokenizer story (curate_pack_bpe consumes a merges table; this learns
    one): repeatedly count adjacent symbol pairs over the corpus and
    merge the most frequent, Sennrich et al. 2016 / GPT-2 style.

    The Spark-native formulation trains on the WORD-FREQUENCY table, not
    the corpus: distinct words with counts (Heaps' law: ~10^6-10^8 rows
    for a 100 TB corpus — distributed here, while the corpus itself never
    re-tokenizes during training). Each round is (a) explode adjacent
    pairs weighted by word count → groupBy sum — map-side partial, one
    narrow-key shuffle; (b) a 1-ROW argmax to the driver (deterministic
    tie-break: count desc, then pair lexicographic — the only driver
    traffic, one row per round); (c) a JVM-side aggregate() fold applying
    the merge to the word symbols (_apply_merge_expr — no Python crossing
    anywhere in the training loop). localCheckpoint cadence cuts the
    iterative lineage exactly like dedup_components. Output: the learned
    merge table (rank, left, right, pair_count)."""
    words = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(TOKENS_SQL)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.expr("split(w, '')").alias("syms"), "cnt")
        .repartition(spark.sparkContext.defaultParallelism)
        .transform(materialize)
    )
    learned = []
    for rank in range(BPE_TRAIN_MERGES):
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select(
                F.posexplode(F.expr("slice(syms, 1, size(syms) - 1)")).alias(
                    "i", "a"
                ),
                F.col("syms"),
                F.col("cnt"),
            )
            .select(
                "a",
                F.expr("element_at(syms, i + 2)").alias("b"),
                "cnt",
            )
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        learned.append((rank, a, b, n))
        words = words.select(
            _apply_merge_expr(a, b, F.col("syms")).alias("syms"), "cnt"
        )
        # checkpoint every 3rd round, not every round: recompute within a
        # 3-round window is at most 3 extra vectorized merge layers
        # (still linear overall), while each dropped checkpoint saves an
        # eager materialization job — ~20% of the operator's wall-clock
        # at sf0.1, where per-round job overhead dominates the tiny
        # Heaps-bounded vocabulary
        if (rank + 1) % 3 == 0:
            words = words.transform(materialize)
    return spark.createDataFrame(
        learned, "rank int, left string, right string, pair_count bigint"
    )


MIX_DENOM = 4  # weight buckets: source s keeps (1 + s%4)/4 of its docs
_HEX32 = 4294967296  # 16^8 — the hexval8 sample-position space


def _mix_keep_pred(engine: str) -> str:
    """Integer Bernoulli keep-test: hexval8(md5(doc_id)) / 16^8 < w/4,
    cross-multiplied so both engines compare exact int64 (no float rate).
    Weight w = 1 + (source number % 4)."""
    from xml_to_parquet_spark.operators.dedup import _hexval

    instr = "instr" if engine == "spark" else "strpos"
    cast = "STRING" if engine == "spark" else "VARCHAR"
    hv = _hexval(f"md5(CAST(doc_id AS {cast}))", instr)
    w = f"(1 + CAST(substr(source, 4) AS BIGINT) % {MIX_DENOM})"
    return f"({hv}) * {MIX_DENOM} < {_HEX32} * {w}"


@register(
    "curate_mixture_sampling",
    f"""
    WITH kept AS (
      SELECT source, doc_id,
             CASE WHEN {_mix_keep_pred('duck')} THEN 1 ELSE 0 END AS keep
      FROM documents
    )
    SELECT source,
           CAST(1 + CAST(substr(source, 4) AS BIGINT) % {MIX_DENOM} AS BIGINT)
               AS weight,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(keep) AS BIGINT) AS n_kept,
           round(CAST(sum(keep) AS BIGINT) / CAST(count(*) AS BIGINT), 6)
               AS kept_ratio
    FROM kept GROUP BY 1, 2
    """,
)
def curate_mixture_sampling(spark, sf_dir):
    """Domain-mixture re-weighting — the training-mix step between
    curation and packing: each source domain is DOWNSAMPLED toward a
    target mixture (weight (1 + src%4)/4 here; a deployment broadcasts a
    measured-target table) with the reproducible-sampling device: keep a
    doc iff hexval8(md5(doc_id)) * 4 < 16^8 * weight — an exact integer
    cross-multiplied Bernoulli, so the SAME docs survive on every run,
    engine, and partitioning (rand()/TABLESAMPLE cannot promise that, and
    a reshuffled corpus silently changes the mix under them). Upsampling
    (weight > 1) is epoch repetition at the data-loader, not the sampler
    — this operator owns the keep/drop half. Output is the per-source
    audit row (total, kept, achieved ratio) a mixture dashboard consumes;
    the flat-rate ancestor is sample_hash_deterministic.

    Scale shape: the keep-test is a map-only codegen'd predicate on
    projected (doc_id, source) — no shuffle to decide membership; the
    audit is one combinable groupBy on source (domain cardinality —
    tiny). At 100 TB the sampled WRITE inherits the same map-only shape;
    achieved ratios converge to the targets by hash uniformity
    (kept_ratio here lands within ~5pp of weight/4 per 25-doc source at
    sf0.01)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    kept = docs.select(
        "source",
        F.expr(_mix_keep_pred("spark")).cast("int").alias("keep"),
    )
    return kept.groupBy("source").agg(
        (1 + F.expr("CAST(substr(source, 4) AS BIGINT)") % MIX_DENOM)
        .cast("bigint")
        .alias("weight"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        F.round(
            F.sum("keep").cast("bigint") / F.count(F.lit(1)).cast("bigint"), 6
        ).alias("kept_ratio"),
    )


# ---------------------------------------------------------------------------
# tokenizer fertility — per-language tokens/word budgeting
# ---------------------------------------------------------------------------

_BPE_ISH_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
_WS_RE = "\\s+"


def _fertility_oracle() -> str:
    from xml_to_parquet_spark.operators.text import _lang_case

    return f"""
    WITH tok AS (
      SELECT doc_id, text, n_chars, {TOKENS_DUCK} AS toks FROM documents
    ),
    m AS (
      SELECT {_lang_case('duck')} AS lang_guess,
             len(regexp_extract_all(text, '{_BPE_ISH_RE}')) AS n_bpe,
             len(string_split_regex(text, '{_WS_RE}')) AS n_ws,
             n_chars
      FROM tok
    )
    SELECT lang_guess,
           CAST(count(*) AS BIGINT)     AS n_docs,
           CAST(sum(n_bpe) AS BIGINT)   AS bpe_tokens,
           CAST(sum(n_ws) AS BIGINT)    AS ws_words,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           round(CAST(sum(n_bpe) AS BIGINT)
                 / CAST(nullif(CAST(sum(n_ws) AS BIGINT), 0) AS DOUBLE), 6)
               AS fertility,
           round(CAST(sum(n_chars) AS BIGINT)
                 / CAST(nullif(CAST(sum(n_bpe) AS BIGINT), 0) AS DOUBLE), 6)
               AS chars_per_token
    FROM m GROUP BY 1
    """


@register("curate_tokenizer_fertility", _fertility_oracle())
def curate_tokenizer_fertility(spark, sf_dir):
    """Per-language tokenizer FERTILITY (BPE-ish tokens per whitespace
    word) and compression (chars per token) — the budgeting table a
    multilingual training run reads before fixing its data mix: a
    language whose fertility is 2x English costs 2x the compute per word,
    and the mix weights (curate_mixture_sampling) are set in TOKENS, not
    documents. Composes two already-proven primitives — text_lang_id's
    deterministic marker-argmax language guess and text_token_count's
    BPE-ish regex pre-tokenizer — into the per-language roll-up
    (tokenizer_fertility in the sense of Rust et al., ACL'21: how many
    subwords the tokenizer spends per word). Every aggregate is an exact
    int64 sum; the two ratios divide identical integers LAST and are
    round(6)ed, with a nullif guard so an all-empty-text language emits
    NULL rather than a cross-engine inf/NULL divergence.

    Scale shape: one map-only projection computes (lang, n_bpe, n_ws,
    n_chars) per document — the regex counts and the marker CASE are all
    JVM codegen, no Python — then a combinable groupBy on a ≤5-key
    language column collapses map-side; the shuffle moves |langs| rows
    per task, nothing data-sized. At 100 TB this is the cheapest shape a
    corpus pass can have: single scan, single tiny exchange. The scan
    prunes to (text, n_chars) — doc_id is not read."""
    from xml_to_parquet_spark.operators.text import _lang_case

    docs = table(spark, sf_dir, "documents").select(
        F.expr(TOKENS_SQL).alias("toks"),
        F.expr(
            f"size(regexp_extract_all(text, '{_BPE_ISH_RE}', 0))"
        ).alias("n_bpe"),
        F.size(F.split("text", _WS_RE)).alias("n_ws"),
        "n_chars",
    )
    m = docs.select(
        F.expr(_lang_case("spark")).alias("lang_guess"), "n_bpe", "n_ws", "n_chars"
    )
    agg = m.groupBy("lang_guess").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_bpe").cast("bigint").alias("bpe_tokens"),
        F.sum("n_ws").cast("bigint").alias("ws_words"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    return agg.select(
        "lang_guess",
        "n_docs",
        "bpe_tokens",
        "ws_words",
        "chars",
        F.round(
            F.col("bpe_tokens") / F.expr("CAST(nullif(ws_words, 0) AS DOUBLE)"), 6
        ).alias("fertility"),
        F.round(
            F.col("chars") / F.expr("CAST(nullif(bpe_tokens, 0) AS DOUBLE)"), 6
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization dedup — the crawl-frontier normalization step
# ---------------------------------------------------------------------------

# Deterministic messy-URL builder: groups of 4 consecutive doc_ids carry
# 4 surface variants of ONE logical URL (scheme, www-prefix + case,
# trailing slash, tracking params, param order) — identical text in both
# engines.
_URL_MESSY_SQL = (
    "CASE CAST(doc_id % 4 AS INT) "
    "WHEN 0 THEN 'https://cdn' || CAST((doc_id - doc_id % 4) % 7 AS STRING)"
    " || '.example.com/docs/' || CAST(doc_id - doc_id % 4 AS STRING)"
    " || '?lang=en' "
    "WHEN 1 THEN 'http://cdn' || CAST((doc_id - doc_id % 4) % 7 AS STRING)"
    " || '.example.com/docs/' || CAST(doc_id - doc_id % 4 AS STRING)"
    " || '/?lang=en' "
    "WHEN 2 THEN 'https://WWW.CDN' || CAST((doc_id - doc_id % 4) % 7 AS STRING)"
    " || '.example.com/docs/' || CAST(doc_id - doc_id % 4 AS STRING)"
    " || '?lang=en&utm_source=feed' "
    "ELSE 'https://cdn' || CAST((doc_id - doc_id % 4) % 7 AS STRING)"
    " || '.example.com/docs/' || CAST(doc_id - doc_id % 4 AS STRING)"
    " || '?ref=rss&lang=en' END"
)

# Canonicalization pipeline (identical regex text in both engines):
# force https, lowercase, strip www., drop the query, strip one trailing
# slash — the standard crawl-frontier normal form (scheme+host+path).
# Regexes use character classes ([.], [?]) instead of backslash escapes:
# Spark SQL string literals process backslashes, DuckDB's do not, so an
# escaped pattern cannot be engine-shared verbatim.
_URL_CANON_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(lower({u}),"
    " '^http://', 'https://'),"
    " '^https://www[.]', 'https://'),"
    " '(/)?[?].*$', '')"
)


@register(
    "curate_url_dedup",
    f"""
    WITH u AS (SELECT doc_id, {_URL_MESSY_SQL} AS url FROM documents),
    c AS (SELECT doc_id, url,
                 {_URL_CANON_SQL.format(u='url')} AS canonical
          FROM u)
    SELECT canonical AS canonical_url,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           CAST(count(*) AS BIGINT)    AS n_variants,
           CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_surface
    FROM c GROUP BY 1
    """,
)
def curate_url_dedup(spark, sf_dir):
    """URL-canonicalization DEDUP — the crawl-frontier step every web
    corpus runs before content dedup (C4/CommonCrawl lineage: the same
    page arrives as http/https, with/without www, with/without trailing
    slash, wrapped in utm/ref tracking params — and surface-form dedup
    misses all of it): normalize each URL to the canonical
    scheme+host+path form (force https, lowercase, strip www., drop the
    query, strip the trailing slash), then keep the smallest doc_id per
    canonical URL. The fixture plants the messiness deterministically —
    every group of 4 consecutive doc_ids carries 4 distinct surface
    variants of one logical URL — so the op provably collapses 4:1 and
    the surface-variant count per survivor is pinned (n_distinct_surface
    = group size). Pure string algebra; all counts exact int64; no
    floats at all.

    Scale shape: canonicalization is a map-only regexp projection
    (JVM codegen); the dedup is ONE combinable groupBy on the canonical
    key (min/count partials collapse map-side — at 100 TB the shuffle
    carries one row per LOGICAL url, not per crawl record). The scan
    prunes to doc_id. The same plan serves real crawl tables by
    swapping the planted builder for the url column."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    c = docs.select(
        "doc_id",
        F.expr(_URL_MESSY_SQL).alias("url"),
    ).select(
        "doc_id",
        "url",
        F.expr(_URL_CANON_SQL.format(u="url")).alias("canonical"),
    )
    return c.groupBy(F.col("canonical").alias("canonical_url")).agg(
        F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_variants"),
        F.countDistinct("url").cast("bigint").alias("n_distinct_surface"),
    )
