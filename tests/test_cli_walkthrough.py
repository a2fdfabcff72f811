"""End-to-end CLI golden test: the reference README walkthrough
(`/root/reference/README.md:9-31`) driven through ``cli.main`` —
create -> populate -> all four exports (gzip text with rowKeyColumn,
snappy seq, gzip avro, snappy parquet with rowKeyColumn) -> read back
via both readers — with cross-sink golden comparison: every sink must
contain the same logical rows.
"""

from __future__ import annotations

import glob
import gzip

import pytest

from hbase_tohdfs_spark import cli
from hbase_tohdfs_spark.formats import avrolite

COLS = ["C1", "C3", "C4", "C5", "C6", "C7", "C8"]

AVRO_SCHEMA = (
    '{"namespace": "example.avro", "type": "record", "name": "Test", "fields": ['
    + ", ".join(f'{{"name": "{c}", "type": "string"}}' for c in COLS)
    + "]}"
)

MAPPERS, RECORDS = 4, 250  # 1000 rows total


@pytest.fixture(scope="module")
def walkthrough(spark, tmp_path_factory):
    """Run the full walkthrough once; tests assert on its outputs."""
    root = tmp_path_factory.mktemp("cli_e2e")
    (root / "schema.csv").write_text(",".join(COLS) + "\n")
    (root / "schema.avsc").write_text(AVRO_SCHEMA)
    tbl = str(root / "kvtable")

    def run(*args) -> int:
        return cli.main([str(a) for a in args], spark=spark)

    assert run("CreateTable", tbl, "c", 4) == 0
    assert run(
        "PopulateTable", MAPPERS, RECORDS, root / "gen", tbl, "c", "run1"
    ) == 0
    assert run(
        "ExportHBaseTableToDelimiteredTxt", tbl, "c", root / "out_txt",
        "true", root / "schema.csv", "|", "C1",
    ) == 0
    assert run(
        "ExportHBaseTableToDelimiteredSeq", tbl, "c", root / "out_seq",
        "snappy", root / "schema.csv", "|",
    ) == 0
    assert run(
        "ExportHBaseTableToAvro", tbl, "c", root / "out_avro",
        "gzip", root / "schema.avsc",
    ) == 0
    assert run(
        "ExportHBaseTableToParquet", tbl, "c", root / "out_parquet",
        "snappy", root / "schema.avsc", "C1",
    ) == 0
    assert run(
        "ExportHBaseTableToOrc", tbl, "c", root / "out_orc",
        "snappy", root / "schema.avsc", "C1",
    ) == 0
    return root


def _txt_lines(folder) -> list[str]:
    lines: list[str] = []
    for part in sorted(glob.glob(f"{folder}/part-*.gz")):
        with gzip.open(part, "rt") as fh:
            lines += [ln.rstrip("\n") for ln in fh]
    return lines


def test_txt_export_golden(walkthrough):
    lines = _txt_lines(walkthrough / "out_txt")
    assert len(lines) == MAPPERS * RECORDS  # one line per row key
    for ln in lines[:5]:
        assert len(ln.split("|")) == len(COLS)
    # Golden shape of PopulateTable's counters: the per-task cell counter
    # restarts every task (PopulateTable.java:132 semantics), so each of
    # the RECORDS distinct lines appears exactly MAPPERS times.
    from collections import Counter

    freq = Counter(lines)
    assert len(freq) == RECORDS
    assert set(freq.values()) == {MAPPERS}
    # Record 0's golden line: cell j of record i has counter i*10+j
    golden0 = "|".join(f"counter:{c[1:]}" for c in COLS)
    assert freq[golden0] == MAPPERS


def test_seq_matches_txt_lines(spark, walkthrough):
    """The seq sink renders the same delimited lines as the text sink
    (modulo the rowKeyColumn flag, which only rewrites C1)."""
    from hbase_tohdfs_spark.sinks.writers import read_sequencefile_lines

    seq = sorted(
        r["line"]
        for r in read_sequencefile_lines(
            spark, str(walkthrough / "out_seq")
        ).collect()
    )
    txt = sorted(_txt_lines(walkthrough / "out_txt"))
    # rowKeyColumn=C1 on the txt run only back-fills MISSING C1 cells and
    # every generated row has one, so the two sinks render identical lines
    assert seq == txt


def test_avro_parquet_cross_sink_golden(spark, walkthrough):
    avro_rows = []
    for part in sorted(glob.glob(f"{walkthrough}/out_avro/part-*.avro")):
        avro_rows += list(avrolite.read_container(part))
    pq = spark.read.parquet(str(walkthrough / "out_parquet"))
    assert sorted(pq.columns) == sorted(COLS)
    pq_rows = [r.asDict() for r in pq.collect()]
    assert len(avro_rows) == len(pq_rows) == MAPPERS * RECORDS
    key = lambda d: tuple(d[c] for c in COLS)  # noqa: E731
    assert sorted(map(key, avro_rows)) == sorted(map(key, pq_rows))


def test_readers_print_schema_and_records(spark, walkthrough, capsys):
    assert cli.main(
        ["AvroReader", str(walkthrough / "out_avro"),
         str(walkthrough / "schema.avsc"), "3"],
        spark=spark,
    ) == 0
    out = capsys.readouterr().out
    assert "struct<" + ",".join(f"{c}:string" for c in COLS) + ">" in out
    assert out.count("{'C1':") == 3

    assert cli.main(
        ["ParquetReader", str(walkthrough / "out_parquet"), "2"], spark=spark
    ) == 0
    out = capsys.readouterr().out
    assert out.count("{'C1':") == 2

    assert cli.main(
        ["OrcReader", str(walkthrough / "out_orc"), "2"], spark=spark
    ) == 0
    out = capsys.readouterr().out
    assert out.count("{'C1':") == 2


def test_arity_validation_rejects_missing_args(spark):
    # reference bug B5 class: wrong arg counts must fail loudly
    with pytest.raises(SystemExit) as ex:
        cli.main(["ExportHBaseTableToAvro", "onlytable"], spark=spark)
    assert ex.value.code != 0


def test_curate_verb_all_ops(spark, tmp_path):
    """The Curate verb writes parquet for every --op over a documents
    table (columns match the testdata layout)."""
    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (i, " ".join(f"w{j}" for j in range(i % 7, i % 7 + 30)),
             "en", f"src{i % 3}", 0)
            for i in range(40)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(docs)

    def run(*args) -> int:
        from hbase_tohdfs_spark import cli

        return cli.main([str(a) for a in args], spark=spark)

    for op, expect_cols in [
        ("split", {"doc_id", "grp", "split"}),
        ("pack", {"doc_id", "stream", "n_tokens", "seq_id", "start_off",
                  "crosses_boundary"}),
        ("decontaminate", {"doc_id", "eval_doc_id", "n_common"}),
        ("passage-dedup", {"doc_id", "n_chunks", "n_kept", "dedup_text"}),
    ]:
        out = str(tmp_path / f"out_{op}")
        assert run("Curate", docs, out, "--op", op) == 0
        got = spark.read.parquet(out)
        assert set(got.columns) == expect_cols
        if op != "decontaminate":  # report may legitimately be empty
            assert got.count() > 0


def test_media_verb_all_modalities(spark, tmp_path):
    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"document body number {i} with several words", "en", "s", 0)
         for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(docs)

    def run(*args) -> int:
        return cli.main([str(a) for a in args], spark=spark)

    for modality, expect_cols, min_rows in [
        ("image", {"doc_id", "stage", "src_width", "src_height", "out_width",
                   "out_height", "channel_means"}, 20),
        ("audio", {"doc_id", "sample_rate", "n_channels", "n_samples",
                   "channel_rms"}, 10),
        ("video", {"doc_id", "n_frames", "frame_idx", "width", "height",
                   "channel_means"}, 10),
    ]:
        out = str(tmp_path / f"media_{modality}")
        assert run("Media", docs, out, "--modality", modality) == 0
        got = spark.read.parquet(out)
        assert set(got.columns) == expect_cols
        assert got.count() >= min_rows


def test_textstats_repetition_flag(spark, tmp_path):
    docs = str(tmp_path / "docs_rep")
    spark.createDataFrame(
        [(1, "spam spam spam spam", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(docs)
    out = str(tmp_path / "rep")
    assert cli.main(["TextStats", docs, out, "--repetition"], spark=spark) == 0
    got = spark.read.parquet(out).collect()
    assert got[0]["top_share"] == 1.0


def test_pii_verb_and_new_choices(spark, tmp_path):
    """Pii verb writes parquet for both ops; Curate --op rebalance and
    AnnTopK --method sq8 are wired through."""
    docs = str(tmp_path / "docs_pii")
    spark.createDataFrame(
        [
            (1, "mail me at a@b.org or visit https://x.example.com/p", "en",
             "s0", 0),
            (2, "call 555-123-4567 from 10.0.0.1", "en", "s1", 0),
            (3, "nothing here", "en", "s1", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(docs)

    def run(*args) -> int:
        from hbase_tohdfs_spark import cli

        return cli.main([str(a) for a in args], spark=spark)

    out = str(tmp_path / "out_scrub")
    assert run("Pii", docs, out) == 0
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert got[1]["n_emails"] == 1 and got[2]["n_phones"] == 1
    assert not got[3]["has_pii"]

    out = str(tmp_path / "out_urls")
    assert run("Pii", docs, out, "--op", "urls") == 0
    doms = {r["domain"] for r in spark.read.parquet(out).collect()}
    assert doms == {"x.example.com"}

    out = str(tmp_path / "out_rebalance")
    assert run("Curate", docs, out, "--op", "rebalance") == 0
    assert set(spark.read.parquet(out).columns) == {
        "source", "n_before", "n_after", "frac_kept"
    }

    emb = str(tmp_path / "emb_sq8")
    spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(30)],
        "vec_id long, embedding array<float>",
    ).write.parquet(emb)
    out = str(tmp_path / "out_sq8")
    assert run("AnnTopK", emb, out, 3, "--method", "sq8",
               "--query-ids", "0,1") == 0
    got = spark.read.parquet(out)
    assert got.count() == 6  # 2 queries x k=3


def test_dedup_phash_method(spark, tmp_path):
    docs = str(tmp_path / "docs_ph")
    spark.createDataFrame(
        [(1, "dup text", "en", "s", 0), (2, "dup text", "en", "s", 0),
         (3, "unique", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(docs)
    from hbase_tohdfs_spark import cli

    out = str(tmp_path / "out_ph")
    assert cli.main(["Dedup", docs, out, "--method", "phash"], spark=spark) == 0
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0]["n_docs"] == 2


def test_orc_matches_parquet_rows(spark, walkthrough):
    """The ORC sink writes the same typed rows as the Parquet sink."""
    pq = spark.read.parquet(str(walkthrough / "out_parquet"))
    orc = spark.read.orc(str(walkthrough / "out_orc"))
    assert orc.schema == pq.schema
    key = lambda d: tuple(d[c] for c in COLS)  # noqa: E731
    assert sorted(map(key, (r.asDict() for r in orc.collect()))) == sorted(
        map(key, (r.asDict() for r in pq.collect()))
    )


def test_sketch_verb_all_methods(spark, tmp_path):
    """The Sketch verb writes parquet for kmv/cms/hll over a grouped
    value column and bloom over a probe/build pair."""
    data = str(tmp_path / "vals")
    spark.range(2000).selectExpr(
        "cast(id % 4 as string) as event_type",
        "cast(id % 300 as string) as user_id",
    ).write.parquet(data)

    def run(*args) -> int:
        from hbase_tohdfs_spark import cli

        return cli.main([str(a) for a in args], spark=spark)

    for method, expect_cols in [
        ("kmv", {"event_type", "n_exact_capped", "n_kmv"}),
        ("hll", {"event_type", "registers_hit", "n_hll"}),
        ("cms", {"user_id", "true_count", "cms_count"}),
        ("bloom", {"n_probed", "n_bloom_pass", "n_true_match",
                   "n_false_pos", "fp_rate"}),
    ]:
        out = str(tmp_path / f"out_{method}")
        assert run("Sketch", data, out, "--method", method) == 0
        got = spark.read.parquet(out)
        assert set(got.columns) == expect_cols
        assert got.count() > 0
