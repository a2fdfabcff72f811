"""Measured recall for the MinHash+LSH near-dup path and blocking
completeness for the SimHash path.

Round 7 gave the embedding-LSH dedup path measured recall
(test_ann_recall.py::test_embedding_dedup_lsh_recall_measured); these
tests give the other two near-dup families the same treatment — the
quality claim is measured on a planted corpus, not argued from theory:

* **MinHash**: banding theory (Broder '97 / MMDS ch.3) says a pair with
  exact Jaccard ``s`` becomes an LSH candidate with probability
  ``p(s) = 1 - (1 - s^r)^b`` (r = rows per band, b = bands; the shipped
  default is r=4, b=4, whose S-curve midpoint sits at s ≈ 0.63).  The
  verify stage re-checks exact Jaccard, so the pipeline's PRECISION is
  1.0 by construction — asserted — and its RECALL at similarity ``s``
  should track ``p(s)``.  Ground truth is brute-force
  ``jaccard_verify`` over ALL doc pairs (no LSH in the loop).
* **SimHash**: ``simhash_dup_pairs`` blocks on 4 disjoint 15-bit chunks
  of the 60-bit fingerprint.  For ``max_hamming <= 3`` the pigeonhole
  argument makes blocking EXACT (3 differing bits cannot touch all 4
  chunks), so the blocked output must EQUAL the brute-force all-pairs
  Hamming filter — completeness (recall = 1.0) measured as set
  equality, not argued.

Everything is deterministic: the corpus is seeded and every hash is
md5-derived, so the measured numbers are stable across runs/platforms
and the assertions are pinned near the observed values with margins
that cover only engine-evolution drift, not run-to-run noise.
"""

from __future__ import annotations

import random

import pytest

from hbase_tohdfs_spark.operators import dedup

# ------------------------------------------------------------------ corpus

N_BASE = 120
DOC_TOKENS = 40
#: token replacements per planted dup, cycled: spread positions kill ~3
#: shingles per replaced token, spanning exact Jaccard ~0.5 .. ~0.9
MUTATIONS = (1, 2, 3, 4)


def _planted_corpus():
    """(doc_id, text) rows: N_BASE random-token docs, each with one
    planted near-dup at a controlled mutation level.  Vocabularies of
    the base draw and the mutation draw are disjoint, so a mutation
    always changes the token."""
    rnd = random.Random(7)
    vocab = [f"w{i:04d}" for i in range(4000)]
    mvocab = [f"m{i:04d}" for i in range(4000)]
    rows = []
    for i in range(N_BASE):
        base = rnd.sample(vocab, DOC_TOKENS)
        rows.append((2 * i, " ".join(base)))
        m = MUTATIONS[i % len(MUTATIONS)]
        dup = list(base)
        # spread replacement positions >= k apart so each kills a
        # disjoint run of k-shingles (similarity is controlled, not
        # assumed — ground truth below re-measures it exactly)
        step = DOC_TOKENS // m
        for j in range(m):
            dup[j * step] = mvocab[rnd.randrange(len(mvocab))]
        rows.append((2 * i + 1, " ".join(dup)))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_planted_corpus(), "doc_id: long, text: string")


@pytest.fixture(scope="module")
def exact_pairs(corpus):
    """Brute-force ground truth: exact word-3-shingle Jaccard >= 0.5
    over ALL doc pairs (no LSH anywhere in this path)."""
    ids = corpus.select("doc_id")
    a = ids.withColumnRenamed("doc_id", "doc_id_a")
    b = ids.withColumnRenamed("doc_id", "doc_id_b")
    allpairs = a.crossJoin(b).filter("doc_id_a < doc_id_b")
    rows = dedup.jaccard_verify(corpus, allpairs, k=3, threshold=0.5).collect()
    return {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in rows}


def _analytic_p(s: float, r: int = dedup.LSH_ROWS, b: int = dedup.LSH_BANDS):
    return 1.0 - (1.0 - s**r) ** b


def test_minhash_recall_tracks_banding_theory(corpus, exact_pairs):
    found = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dedup.minhash_dedup_pairs(corpus, k=3, threshold=0.5).collect()
    }
    truth = set(exact_pairs)
    # sanity: the corpus actually planted a similarity spread
    assert len(truth) >= 80
    sims = sorted(exact_pairs.values())
    assert sims[0] < 0.6 and sims[-1] > 0.85

    # precision 1.0 by construction (exact verify stage) — pinned
    assert found <= truth

    # measured overall recall vs the analytic banding expectation
    recall = len(found & truth) / len(truth)
    expected = sum(_analytic_p(s) for s in exact_pairs.values()) / len(truth)
    assert abs(recall - expected) <= 0.12, (recall, expected)

    # the high-similarity band is where near-dup recall must be strong
    high = {p for p, s in exact_pairs.items() if s >= 0.8}
    if high:
        high_recall = len(found & high) / len(high)
        assert high_recall >= 0.85, (high_recall, len(high))


def test_minhash_banding_knob_recall_at_low_s(corpus, exact_pairs):
    """The banding knob exists for LOW-similarity dedup (r7 verdict task
    5): the default 4x4 S-curve is steep at s ~ 0.75, so pairs at
    s ~ 0.5 slip through (analytic p ~ 0.23 at s=0.5).  8x2 re-centers
    the curve — measured recall on the s in [0.45, 0.6) band must reach
    0.9 on the same planted corpus where the default demonstrably does
    not, with precision still 1.0 (the exact verify stage is unchanged).
    """
    low = {p for p, s in exact_pairs.items() if s < 0.6}
    assert len(low) >= 20, len(low)  # the corpus plants a low-s band

    found_8x2 = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dedup.minhash_dedup_pairs(
            corpus, k=3, threshold=0.5, bands=8, rows_per_band=2
        ).collect()
    }
    # precision 1.0: the exact verify stage is unchanged by the banding
    assert found_8x2 <= set(exact_pairs)
    recall_low = len(found_8x2 & low) / len(low)
    assert recall_low >= 0.9, (recall_low, len(low))

    # the default banding really is blind at this band (the knob earns
    # its existence): analytic expectation ~0.2-0.35 there
    found_default = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dedup.minhash_dedup_pairs(
            corpus, k=3, threshold=0.5
        ).collect()
    }
    default_low = len(found_default & low) / len(low)
    assert default_low < recall_low, (default_low, recall_low)
    # and the measured 8x2 curve tracks its own analytic form
    expected = sum(
        _analytic_p(s, r=2, b=8) for s in exact_pairs.values()
    ) / len(exact_pairs)
    overall = len(found_8x2 & set(exact_pairs)) / len(exact_pairs)
    assert abs(overall - expected) <= 0.12, (overall, expected)


def test_simhash_blocking_is_complete(spark, corpus):
    """Blocked pairs == brute-force all-pairs Hamming filter: the 4x15-bit
    pigeonhole blocking loses NOTHING at max_hamming <= 3."""
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash(corpus).collect()}
    ids = sorted(fps)
    brute = set()
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            if bin(fps[da] ^ fps[db]).count("1") <= 3:
                brute.add((da, db))
    blocked = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dedup.simhash_dup_pairs(corpus, max_hamming=3).collect()
    }
    assert blocked == brute
    # the corpus must exercise the claim: some pairs at distance 0 < h <= 3
    # would be lost by a broken chunk split, so require a few
    nonzero = [p for p in brute if fps[p[0]] != fps[p[1]]]
    assert len(brute) >= 5 and len(nonzero) >= 1, (len(brute), len(nonzero))


def test_simhash_wide_low_bits_match_narrow(spark, corpus):
    """bits=120 is a strict extension: its low 60 bits are voted from the
    same token hashes as the default fingerprint, so the ``simhash``
    column must be identical doc-for-doc."""
    narrow = {r["doc_id"]: r["simhash"] for r in dedup.simhash(corpus).collect()}
    wide = {
        r["doc_id"]: (r["simhash"], r["simhash_hi"])
        for r in dedup.simhash(corpus, bits=120).collect()
    }
    assert set(narrow) == set(wide)
    assert all(wide[d][0] == narrow[d] for d in narrow)
    # the high half must carry real signal (not all-zero / all-equal)
    assert len({hi for _, hi in wide.values()}) > len(wide) // 2


def test_simhash_wide_blocking_is_complete(spark, corpus):
    """120-bit pigeonhole: blocked pairs at bits=120 == brute-force
    all-pairs filter on hamming(low)+hamming(high) <= 3.  Same exactness
    claim as the 60-bit test, measured on the wide chunk layout
    (4 x 30-bit, two chunks per 60-bit half)."""
    fps = {
        r["doc_id"]: (r["simhash"], r["simhash_hi"])
        for r in dedup.simhash(corpus, bits=120).collect()
    }
    ids = sorted(fps)
    brute = set()
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            ham = bin(fps[da][0] ^ fps[db][0]).count("1") + bin(
                fps[da][1] ^ fps[db][1]
            ).count("1")
            if ham <= 3:
                brute.add((da, db))
    blocked = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dedup.simhash_dup_pairs(corpus, max_hamming=3, bits=120).collect()
    }
    assert blocked == brute
    # exercise the claim: the 120-bit filter is strictly harsher than the
    # 60-bit one on this corpus (more bits to disagree on), but planted
    # exact-structure dups must still surface
    assert len(brute) >= 1, len(brute)


def test_simhash_wide_adds_no_exchanges(spark, corpus):
    """bits=120 costs 60 extra codegen vote columns, NOT shuffles: the
    signature plan keeps exactly one exchange (the doc_id partial->final
    agg) at either width, so the wide fingerprint's scale cost is the
    wider agg row — the shuffle structure is identical."""
    import contextlib
    import io

    def n_exchanges(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        # formatted explain names each node in the tree AND in the
        # details section; counting tree rows only ("(N) Exchange")
        # keeps the number a node count
        return sum(
            1
            for line in buf.getvalue().splitlines()
            if ") Exchange" in line and "Reuse" not in line
        )

    narrow = n_exchanges(dedup.simhash(corpus))
    wide = n_exchanges(dedup.simhash(corpus, bits=120))
    assert narrow == wide == 1, (narrow, wide)


def test_simhash_wide_matches_duckdb_replay(spark, corpus):
    """The 120-bit pipeline is ANSI-SQL-replayable end-to-end, the same
    bar the registry oracle holds the 60-bit path to: DuckDB computes
    both md5 halves' votes, the 4x30-bit chunk blocking, and the
    two-half hamming, and must emit the identical (a, b, hamming)
    set."""
    import duckdb

    rows = corpus.select("doc_id", "text").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(r["doc_id"], r["text"]) for r in rows],
    )

    def bit_terms(hcol):
        return " + ".join(
            f"(CASE WHEN list_sum(list_transform({hcol}, h -> ((h >> {b}) & 1) * 2 - 1)) > 0"
            f" THEN (1::BIGINT << {b}) ELSE 0 END)"
            for b in range(60)
        )

    chunk_rows = " UNION ALL ".join(
        f"SELECT doc_id, s0, s1, {c} AS chunk_idx,"
        f" ({col} >> {sh}) & 1073741823 AS chunk FROM sh"
        for c, (col, sh) in enumerate(
            (("s0", 0), ("s0", 30), ("s1", 0), ("s1", 30))
        )
    )
    oracle = con.sql(f"""
    WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> x <> '') AS t FROM documents),
    hashed AS (SELECT doc_id,
               list_transform(t, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS h0,
               list_transform(t, x -> ('0x' || substr(md5(x), 17, 15))::BIGINT) AS h1
               FROM toks WHERE len(t) > 0),
    sh AS (SELECT doc_id, {bit_terms('h0')} AS s0, {bit_terms('h1')} AS s1 FROM hashed),
    chunks AS ({chunk_rows}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                    a.s0 AS sa0, a.s1 AS sa1, b.s0 AS sb0, b.s1 AS sb1
             FROM chunks a JOIN chunks b
               ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
              AND a.doc_id < b.doc_id)
    SELECT doc_id_a, doc_id_b,
           bit_count(xor(sa0, sb0)) + bit_count(xor(sa1, sb1)) AS hamming
    FROM cand
    WHERE bit_count(xor(sa0, sb0)) + bit_count(xor(sa1, sb1)) <= 3
    """).fetchall()
    got = {
        (r["doc_id_a"], r["doc_id_b"], r["hamming"])
        for r in dedup.simhash_dup_pairs(corpus, max_hamming=3, bits=120).collect()
    }
    assert got == {(a, b, int(h)) for a, b, h in oracle}
    assert len(got) >= 1


def test_simhash_bits_validation(corpus):
    with pytest.raises(ValueError):
        dedup.simhash(corpus, bits=64)
    with pytest.raises(ValueError):
        dedup.simhash_dup_pairs(corpus, bits=128)
