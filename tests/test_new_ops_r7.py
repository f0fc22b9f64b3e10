"""Semantic tests for the round-7 [EXT] additions: exact substring dedup
(Lee et al. k-token tier), bloom-pruned join, DPP scan, hashed-bigram
quality classifier, BPE packing.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from xml_to_parquet_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _words(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


@pytest.fixture(scope="module")
def planted_docs_dir(tmp_path_factory):
    """A documents.parquet with exact substrings planted across docs:

    - docs 0 and 1 share one 25-token span S (unique filler around it);
    - docs 2 and 3 share two disjoint spans of 20 and 22 tokens;
    - doc 4 shares nothing with anyone.
    """
    S = _words("shared", 25)
    s20 = _words("alpha", 20)
    s22 = _words("beta", 22)
    rows = [
        (0, " ".join(_words("ua", 10) + S + _words("ub", 10))),
        (1, " ".join(_words("uc", 5) + S + _words("ud", 15))),
        (2, " ".join(_words("ue", 4) + s20 + _words("uf", 6) + s22)),
        (3, " ".join(s22 + _words("ug", 7) + s20 + _words("uh", 3))),
        (4, " ".join(_words("lonely", 60))),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "src0"
    df["n_chars"] = df["text"].str.len()
    d = tmp_path_factory.mktemp("planted_docs")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_dedup_substring_planted_spans(spark, planted_docs_dir, reg):
    """Exact window counts and merged span lengths on planted substrings.
    A k-token window slides over a planted span of length L surrounded by
    unique filler, giving L-k+1 matching windows and a merged span of
    exactly L tokens."""
    from xml_to_parquet_spark.operators.dedup import SUBSTR_K as k

    out = reg["dedup_substring"].fn(spark, planted_docs_dir).toPandas()
    by_pair = {(r.doc_a, r.doc_b): r for r in out.itertuples()}
    assert set(by_pair) == {(0, 1), (2, 3)}
    # pair (0,1): one 25-token span
    r01 = by_pair[(0, 1)]
    assert r01.n_matches == 25 - k + 1
    assert r01.longest_span == 25
    # pair (2,3): spans of 20 and 22 tokens, merged independently
    r23 = by_pair[(2, 3)]
    assert r23.n_matches == (20 - k + 1) + (22 - k + 1)
    assert r23.longest_span == 22


def test_dedup_substring_no_false_pairs_on_corpus(spark, sf_dir, reg):
    """On the synthetic corpus every reported pair must actually share a
    verbatim k-token span (verified in pandas against the raw text), and
    longest_span is consistent with n_matches."""
    from xml_to_parquet_spark.operators.dedup import SUBSTR_K as k

    out = reg["dedup_substring"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["longest_span"] >= k).all()
    # a merged span of length L contains L-k+1 windows, so n_matches can
    # never be smaller than longest_span - k + 1
    assert (out["n_matches"] >= out["longest_span"] - k + 1).all()
    docs = dict(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.lower("text").alias("t"))
        .collect()
    )
    for r in out.head(10).itertuples():
        ta, tb = docs[r.doc_a].split(), docs[r.doc_b].split()
        grams_a = {" ".join(ta[i : i + k]) for i in range(len(ta) - k + 1)}
        grams_b = {" ".join(tb[i : i + k]) for i in range(len(tb) - k + 1)}
        assert grams_a & grams_b, (r.doc_a, r.doc_b)


def test_quality_classifier_semantics(spark, sf_dir, reg):
    """Scores are proper probabilities, the gate is exactly score>=0.5,
    and n_bigrams is n_tokens-1 for every doc with >=2 tokens."""
    out = reg["text_quality_classifier"].fn(spark, sf_dir).toPandas()
    assert (out["score"] > 0).all() and (out["score"] < 1).all()
    assert (out["passes"] == (out["score"] >= 0.5)).all()
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id", "size(split(lower(text), '\\\\s+')) AS n")
        .filter("n >= 2")
        .toPandas()
    )
    merged = out.merge(toks, on="doc_id")
    assert len(merged) == len(out) == len(toks)
    assert (merged["n_bigrams"] == merged["n"] - 1).all()


def test_bpe_reference_encoder_goldens():
    """Hand-computed goldens for the reference encoder: 'the' collapses via
    (t,h)->(th,e) to one token; 'spark' via s,p->sp / sp,ar->spar /
    spar,k; unknown words stay at one token per unmergeable symbol."""
    from xml_to_parquet_spark.operators.curation import BPE_RANKS, bpe_token_count

    assert bpe_token_count("the", BPE_RANKS) == 1
    assert bpe_token_count("spark", BPE_RANKS) == 1
    assert bpe_token_count("query", BPE_RANKS) == 1
    # 'z' has no merges at all
    assert bpe_token_count("zzz", BPE_RANKS) == 3
    # 'ther': th+e merges, trailing r attaches only if (the,r) ranked - not
    assert bpe_token_count("ther", BPE_RANKS) == 2
    assert bpe_token_count("", BPE_RANKS) == 0


def test_curate_pack_bpe_matches_python_reference(spark, sf_dir, reg):
    """Every Spark-computed BPE count equals the pure-Python reference
    encoder run over the same text, and packing is the exclusive-cumsum
    contract: each doc's seq_id == floor(cum_tokens_before / budget)."""
    from xml_to_parquet_spark.operators.curation import (
        BPE_RANKS,
        SEQ_BUDGET,
        bpe_token_count,
    )

    out = reg["curate_pack_bpe"].fn(spark, sf_dir).toPandas().sort_values("doc_id")
    texts = dict(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    assert len(out) > 0
    for r in out.itertuples():
        expect = sum(
            bpe_token_count(wd, BPE_RANKS) for wd in texts[r.doc_id].lower().split()
        )
        assert r.n_tokens == expect, r.doc_id
    cum = out["n_tokens"].cumsum() - out["n_tokens"]
    assert (out["seq_id"] == (cum // SEQ_BUDGET)).all()
    # BPE compresses: token count strictly between word count and char count
    nwords = out["doc_id"].map(lambda d: len(texts[d].split()))
    assert (out["n_tokens"] >= nwords).all()


def test_semdedup_matches_numpy_brute_force(spark, sf_dir, reg):
    """Recompute the whole SemDeDup pipeline (centroid assign → in-cluster
    cosine → keep-lowest-id) in numpy and compare the pruned set."""
    import numpy as np

    from xml_to_parquet_spark.operators.similarity import (
        N_CENTROIDS,
        SEMDEDUP_COS,
    )

    out = reg["dedup_semdedup"].fn(spark, sf_dir).toPandas()
    emb_rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb_rows])
    M = np.array([r.embedding for r in emb_rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    cent = M[ids < N_CENTROIDS]
    d2 = ((M[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    # operator tie-break: rounded distance, then centroid id (argmin on
    # the rounded matrix takes the first/lowest cid on ties)
    cid = np.argmin(np.round(d2, 6), axis=1)
    nrm = np.linalg.norm(M, axis=1)
    cos = (M @ M.T) / np.outer(nrm, nrm)
    expect = {}
    for j in range(len(ids)):
        mates = np.where((cid == cid[j]) & (ids < ids[j]))[0]
        mates = mates[cos[mates, j] > SEMDEDUP_COS]
        if len(mates):
            c = np.round(cos[mates, j], 6)
            best = mates[np.lexsort((ids[mates], -c))][0]
            expect[ids[j]] = (cid[j], ids[best], c[np.argmax(c == c.max())])
    got = {r.vec_id: (r.centroid_id, r.keeper_id, r.cos) for r in out.itertuples()}
    assert set(got) == set(expect)
    for v, (gc, gk, gcos) in got.items():
        ec, ek, ecos = expect[v]
        assert gc == ec and gk == ek, (v, got[v], expect[v])
        assert abs(gcos - ecos) < 1e-6
    # contract sanity: the keeper always precedes the pruned vector
    assert (out["keeper_id"] < out["vec_id"]).all()
    assert (out["cos"] > SEMDEDUP_COS).all()


from collections import defaultdict
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _expected_substring_pairs(docs, k, max_df):
    """Pure-Python reference for dedup_substring: per ordered doc pair,
    (n matching k-token windows, longest merged span in tokens)."""
    grams = defaultdict(list)
    for d, toks in docs.items():
        for i in range(len(toks) - k + 1):
            grams[" ".join(toks[i : i + k])].append((d, i))
    hits = defaultdict(list)
    for es in grams.values():
        if len({d for d, _ in es}) > max_df:
            continue
        for (d1, p1), (d2, p2) in combinations(es, 2):
            if d1 == d2:
                continue
            (a, pa), (_, pb) = ((d1, p1), (d2, p2)) if d1 < d2 else ((d2, p2), (d1, p1))
            b = max(d1, d2)
            hits[(a, b)].append((pa, pa - pb))
    out = {}
    for pair, hs in hits.items():
        bydiag = defaultdict(list)
        for pa, di in hs:
            bydiag[di].append(pa)
        longest = 0
        for ps in bydiag.values():
            ps = sorted(ps)
            run = best = 1
            for x, y in zip(ps, ps[1:]):
                run = run + 1 if y == x + 1 else 1
                best = max(best, run)
            longest = max(longest, best)
        out[pair] = (len(hs), longest + k - 1)
    return out


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=20, max_size=60),
        min_size=4,
        max_size=16,
    )
)
def test_dedup_substring_property_vs_python_reference(spark, tmp_path_factory, data):
    """Random corpora from a 5-word alphabet (dense window collisions by
    construction): the operator's (n_matches, longest_span) must equal a
    pure-Python recomputation for every pair, including multi-occurrence
    grams and overlapping diagonals hypothesis finds."""
    import pandas as pd

    from xml_to_parquet_spark.operators.dedup import SUBSTR_K, SUBSTR_MAX_DF

    docs = {i: toks for i, toks in enumerate(data)}
    df = pd.DataFrame(
        {"doc_id": list(docs), "text": [" ".join(t) for t in docs.values()]}
    )
    df["lang"] = "en"
    df["source"] = "src0"
    df["n_chars"] = df["text"].str.len()
    d = tmp_path_factory.mktemp("prop_docs")
    df.to_parquet(d / "documents.parquet", index=False)
    out = load_all()["dedup_substring"].fn(spark, str(d)).toPandas()
    got = {
        (r.doc_a, r.doc_b): (r.n_matches, r.longest_span) for r in out.itertuples()
    }
    assert got == _expected_substring_pairs(docs, SUBSTR_K, SUBSTR_MAX_DF)


def test_derived_partsupp_contract(spark, sf_dir):
    """The derived partsupp is TPC-H-faithful: exactly 4 distinct
    suppliers per part (the modular step never collides at the test
    supplier counts), availqty in [1,1000], supplycost in [100,1000),
    suppkeys inside the supplier key domain."""
    from xml_to_parquet_spark.operators.tpch_derived import partsupp

    ps = partsupp(spark, sf_dir).toPandas()
    n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    n_supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").count()
    per_part = ps.groupby("ps_partkey").size()
    assert len(per_part) == n_parts
    assert (per_part == 4).all()
    assert ps["ps_availqty"].between(1, 1000).all()
    assert ps["ps_supplycost"].between(100, 1000).all()
    assert ps["ps_suppkey"].between(0, n_supp - 1).all()


def test_q2_rows_are_regional_minima(spark, sf_dir, reg):
    """Every returned supplier really offers the minimum ASIA-region cost
    for its part (recomputed in pandas over the derived partsupp)."""
    from xml_to_parquet_spark.operators.tpch_derived import partsupp

    out = reg["q2_min_cost_supplier"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    ps = partsupp(spark, sf_dir).toPandas()
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").toPandas()
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").toPandas()
    reg_t = spark.read.parquet(f"{sf_dir}/region.parquet").toPandas()
    asia_nations = nat.merge(
        reg_t[reg_t.r_name == "ASIA"], left_on="n_regionkey",
        right_on="r_regionkey",
    )["n_nationkey"]
    asia_supp = supp[supp.s_nationkey.isin(asia_nations)]["s_suppkey"]
    regional = ps[ps.ps_suppkey.isin(asia_supp)]
    min_cost = regional.groupby("ps_partkey")["ps_supplycost"].min()
    for r in out.itertuples():
        assert abs(r.ps_supplycost - min_cost[r.p_partkey]) < 1e-9


def test_q21_waiters_have_positive_counts(spark, sf_dir, reg):
    """Q21 shape sanity: every supplier reported kept at least one order
    waiting, and the late-boolean derivation yields a mixed population
    (neither all-late nor none-late)."""
    out = reg["q21_suppliers_who_kept_waiting"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["numwait"] >= 1).all()
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.tpch_derived import _late_hex, _late_md5

    mc, mr = _late_md5("instr")
    ch, rh = _late_hex("instr")
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.expr(mc).alias("mc"), F.expr(mr).alias("mr"))
        .select(((1 + F.expr(rh) % 45) > (1 + F.expr(ch) % 30)).alias("late"))
    )
    frac = li.agg(F.avg(F.col("late").cast("double"))).collect()[0][0]
    assert 0.3 < frac < 0.9, frac


def test_substring_removal_cleans_planted_span(spark, planted_docs_dir, reg):
    """On the planted corpus: doc 1 (higher id of the (0,1) pair) loses
    exactly its 25-token shared span, keeping its unique filler in order;
    doc 0 keeps the canonical copy (is not in the output at all); docs 2/3
    lose their shared spans with doc 3 cleaned only where it is the
    higher id."""
    out = reg["dedup_substring_removal"].fn(spark, planted_docs_dir).toPandas()
    by_doc = {r.doc_id: r for r in out.itertuples()}
    # doc 0 and doc 2 are the LOWER ids of their pairs: never cleaned
    assert 0 not in by_doc and 2 not in by_doc
    r1 = by_doc[1]
    assert r1.n_removed == 25
    expect1 = " ".join(
        [f"uc{i}" for i in range(5)] + [f"ud{i}" for i in range(15)]
    )
    assert r1.cleaned_text == expect1
    assert r1.n_kept == 20
    r3 = by_doc[3]
    assert r3.n_removed == 20 + 22  # both planted spans
    expect3 = " ".join([f"ug{i}" for i in range(7)] + [f"uh{i}" for i in range(3)])
    assert r3.cleaned_text == expect3


def test_substring_removal_conserves_tokens(spark, sf_dir, reg):
    """n_removed + n_kept equals the document's token count, and removed
    spans really were duplicated: every affected doc appears as doc_b in
    the detection operator's output."""
    out = reg["dedup_substring_removal"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    ntok = dict(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id", "size(split(lower(text), '\\\\s+')) AS n")
        .collect()
    )
    for r in out.itertuples():
        assert r.n_removed + r.n_kept == ntok[r.doc_id], r.doc_id
    pairs = reg["dedup_substring"].fn(spark, sf_dir).toPandas()
    assert set(out["doc_id"]) == set(pairs["doc_b"])


def test_minhash_incremental_equals_full_lsh_cross_slice(spark, sf_dir, reg):
    """The incremental probe must find EXACTLY the full-corpus LSH pairs
    that straddle the batch/index split (one side doc_id%10==0, the other
    not) — the persisted index changes the lifecycle, never the result."""
    inc = reg["dedup_minhash_incremental"].fn(spark, sf_dir).toPandas()
    full = reg["dedup_minhash_lsh"].fn(spark, sf_dir).toPandas()
    got = {tuple(sorted((r.batch_doc, r.index_doc))) for r in inc.itertuples()}
    expect = {
        tuple(sorted((r.doc_a, r.doc_b)))
        for r in full.itertuples()
        if (r.doc_a % 10 == 0) != (r.doc_b % 10 == 0)
    }
    assert got == expect
    assert (inc["batch_doc"] % 10 == 0).all()
    assert (inc["index_doc"] % 10 != 0).all()
    assert inc["n_bands"].between(1, 4).all()


def test_mm_image_dedup_recall_guarantee(spark, sf_dir, reg):
    """The banding must find EVERY same-dims pair within hamming <= 2
    (pigeonhole guarantee) — verified against a brute-force pandas pass
    over the full phash table — and report correct hamming distances."""
    ph = reg["mm_image_phash"].fn(spark, sf_dir).toPandas()
    out = reg["mm_image_dedup"].fn(spark, sf_dir).toPandas()
    from xml_to_parquet_spark.operators.multimodal import MM_DEDUP_HAMMING

    got = {(r.doc_a, r.doc_b): r.hamming for r in out.itertuples()}
    expect = {}
    import itertools

    for (_, _), grp in ph.groupby(["width", "height"]):
        rows = sorted(grp.itertuples(), key=lambda r: r.doc_id)
        for a, b in itertools.combinations(rows, 2):
            h = bin(a.dhash ^ b.dhash).count("1")
            if h <= MM_DEDUP_HAMMING:
                expect[(a.doc_id, b.doc_id)] = h
    assert got == expect
    assert len(got) > 0


def test_bpe_train_matches_python_reference(spark, sf_dir, reg):
    """The distributed trainer must learn EXACTLY the merge sequence a
    pure-python reference trainer learns from the same word-frequency
    table (count desc, then lexicographic pair tie-break), including the
    pair counts at each step."""
    from collections import Counter

    from xml_to_parquet_spark.operators.curation import BPE_TRAIN_MERGES

    out = reg["text_bpe_train"].fn(spark, sf_dir).toPandas()
    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    wc = Counter(w for t in texts for w in t.lower().split() if w)
    words = {w: (list(w), c) for w, c in wc.items()}
    expect = []
    for rank in range(BPE_TRAIN_MERGES):
        pc = Counter()
        for syms, c in words.values():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        expect.append((rank, a, b, n))
        for w, (syms, c) in words.items():
            out_s = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out_s.append(a + b)
                    i += 2
                else:
                    out_s.append(syms[i])
                    i += 1
            words[w] = (out_s, c)
    got = [(r.rank, r.left, r.right, r.pair_count) for r in out.itertuples()]
    assert got == expect
    assert len(got) == BPE_TRAIN_MERGES


def test_knn_graph_contract(spark, sf_dir, reg):
    """Every vector gets exactly KNN_K neighbors (blocks are larger than
    K), ranks are 1..K with non-increasing cosine, and rank-1 equals the
    numpy argmax over the same block."""
    import numpy as np

    from xml_to_parquet_spark.operators.similarity import KNN_K

    out = reg["sim_knn_graph"].fn(spark, sf_dir).toPandas()
    per_vec = out.groupby("vec_id")
    assert (per_vec.size() == KNN_K).all()
    for _, g in per_vec:
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, KNN_K + 1))
        assert (g["cos"].diff().dropna() <= 1e-12).all()
    emb_rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    by_label = {}
    for r in emb_rows:
        by_label.setdefault(r.label, []).append((r.vec_id, np.array(r.embedding, dtype=np.float64)))
    top1 = {r.vec_id: r.neighbor_id for r in out.itertuples() if r.rank == 1}
    import itertools

    for label, rows in itertools.islice(by_label.items(), 2):
        ids = np.array([i for i, _ in rows])
        M = np.array([v for _, v in rows])
        nrm = np.linalg.norm(M, axis=1)
        C = np.round((M @ M.T) / np.outer(nrm, nrm), 6)
        np.fill_diagonal(C, -np.inf)
        for j, vid in enumerate(ids):
            best = C[j].max()
            cands = sorted(ids[k] for k in range(len(ids)) if C[j, k] == best)
            assert top1[vid] == cands[0], vid
