"""CLI entrypoint: the reference's date-keyed script surface
(extract/upload/load chained by YYYYMMDD) driven through
``python -m reddit_etl_pipeline_spark`` subcommands, in-process."""

import pytest
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.__main__ import main  # noqa: E402


@pytest.mark.slow
def test_daily_then_backfill_then_vacuum(spark, tmp_path, capsys):
    lake, wh = str(tmp_path / "lake"), str(tmp_path / "wh")
    rc = main(
        ["daily", "--date", "20250318", "--lake", lake, "--warehouse", wh,
         "--fake-source", "40"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["20250318"]["warehouse_rows"] == 40

    rc = main(
        ["backfill", "--dates", "20250320,20250324", "--lake", lake,
         "--warehouse", wh, "--fake-source", "40"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(out) == ["20250320", "20250324"]

    rc = main(
        ["vacuum", "--path", lake, "--keep-days", "5", "--as-of", "20250324"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dropped_partitions"] == ["20250318"]
    # surviving days still load
    assert spark.read.parquet(lake).select("batch_date").distinct().count() == 2


def test_compact_subcommand(spark, tmp_path, capsys):
    path = str(tmp_path / "t")
    spark.range(1000).repartition(16).write.parquet(path)
    rc = main(["compact", "--path", path])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["output_files"] == 1
    assert spark.read.parquet(path).count() == 1000


def test_missing_source_config_is_a_clean_error(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        main(
            ["daily", "--date", "20250318", "--lake", str(tmp_path / "l"),
             "--warehouse", str(tmp_path / "w")]
        )


def test_curate_subcommand(spark, sf_dir, tmp_path, capsys):
    """End-to-end corpus curation: dedup + gates + scrub over the real
    documents table; counts must be monotone non-increasing and the
    written table must carry the derived columns with scrubbed text."""
    out_path = str(tmp_path / "curated")
    rc = main(
        ["curate", "--input", f"{sf_dir}/documents.parquet",
         "--output", out_path]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (
        rep["input"] >= rep["after_exact_dedup"]
        >= rep["after_neardup"] >= rep["after_quality_gate"]
        == rep["written"] > 0
    )
    curated = spark.read.parquet(out_path)
    assert {"doc_id", "text", "lang_pred", "quality"} <= set(curated.columns)
    # gates actually applied
    assert curated.filter("quality < 0.45 OR lang_pred = 'und'").count() == 0


@pytest.mark.slow
def test_curate_lm_tail_drop(spark, sf_dir, tmp_path, capsys):
    out_path = str(tmp_path / "curated_lm")
    rc = main(
        ["curate", "--input", f"{sf_dir}/documents.parquet",
         "--output", out_path, "--lm-tail-drop"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the tail drop removes roughly a third of each language (plus
    # unscorable docs) — strictly fewer than the gate stage, never zero
    assert 0 < rep["after_lm_tail_drop"] < rep["after_quality_gate"]
    assert rep["written"] == rep["after_lm_tail_drop"]


def test_curate_c4_rules(spark, sf_dir, tmp_path, capsys):
    out_path = str(tmp_path / "curated_c4")
    rc = main(
        ["curate", "--input", f"{sf_dir}/documents.parquet",
         "--output", out_path, "--c4-rules"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["after_c4_rules"] <= rep["after_quality_gate"] <= rep["after_neardup"]
    assert rep["written"] == rep["after_c4_rules"]


@pytest.mark.slow
def test_curate_keep_best_picks_quality_representative(spark, tmp_path):
    """--keep best must retain the highest-quality member of a near-dup
    cluster instead of the lowest id."""
    from reddit_etl_pipeline_spark.plans.curation import curate_corpus

    base = (
        "the quick brown fox jumps over the lazy dog and keeps on running "
        "through the wide green field toward the river " * 2
    )
    docs = spark.createDataFrame(
        [
            (0, base + "!!! ### $$$"),
            (1, base + "with a clean closing sentence of plain words"),
            (7, "an entirely different document about engines and planes "
                "with enough words to pass the quality gate easily today"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    out_first = str(tmp_path / "first")
    out_best = str(tmp_path / "best")
    r1 = curate_corpus(spark, src, out_first, min_quality=0.1,
                       neardup_threshold=0.5, keep="first")
    r2 = curate_corpus(spark, src, out_best, min_quality=0.1,
                       neardup_threshold=0.5, keep="best")
    first_ids = {r.doc_id for r in spark.read.parquet(out_first).collect()}
    best_ids = {r.doc_id for r in spark.read.parquet(out_best).collect()}
    assert first_ids == {0, 7}
    assert best_ids == {1, 7}
    assert r1["after_neardup"] == r2["after_neardup"] == 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep"):
        curate_corpus(spark, src, out_best, keep="nope")


def test_curate_survives_stage_emptying_corpus(spark, tmp_path):
    """The C4 terminal-punctuation rule removes every doc of a corpus
    without sentence punctuation; the driver must then skip the LM fit
    (which raises on a bigram-less corpus) and write an empty output
    with a zeroed report — not crash."""
    from reddit_etl_pipeline_spark.plans.curation import curate_corpus

    docs = spark.createDataFrame(
        [(i, "plain words without any terminal punctuation marks at all "
             "just tokens and more tokens flowing on " * 3) for i in range(6)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "curated")
    rep = curate_corpus(spark, src, out, min_quality=0.1,
                        c4_rules=True, lm_tail_drop=True)
    assert rep["after_c4_rules"] == 0
    assert rep["after_lm_tail_drop"] == 0
    assert rep["written"] == 0
    assert spark.read.parquet(out).count() == 0


@pytest.mark.slow
def test_curate_neardup_minhash(spark, sf_dir, tmp_path, capsys):
    """--neardup minhash swaps the exact token-set-Jaccard pair graph for
    banded shingle-MinHash (the corpus-scale path). On TRUE
    near-duplicates — copies with a small edit, where both token-set and
    shingle Jaccard are high — the two modes must collapse the SAME
    clusters; that's the parity that matters (the synthetic documents
    table instead has a bag-of-words similarity continuum with low
    sequence overlap, where only exact mode fires by design — see
    neardup_clusters' docstring)."""
    rows = []
    for c in range(12):  # 12 disjoint clusters x 3 near-identical copies
        words = [f"c{c}w{j}" for j in range(160)]  # cluster-unique vocab
        t = " ".join(words)
        edited = words[:]
        edited[80] = f"c{c}edit"  # one mid-word edit: J_tok~0.99, J_sh~0.96
        rows += [
            (c * 10, t),
            (c * 10 + 1, t + " extra"),
            (c * 10 + 2, " ".join(edited)),
        ]
    for i in range(30):  # plus 30 mutually-unrelated docs
        rows.append((1000 + i, f"unique document {i} " + " ".join(
            f"tok{i}x{j}" for j in range(40))))
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    out_e = str(tmp_path / "cur_exact")
    out_m = str(tmp_path / "cur_minhash")
    assert main(["curate", "--input", src, "--output", out_e,
                 "--min-quality", "0.0"]) == 0
    rep_e = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main(["curate", "--input", src, "--output", out_m,
                 "--neardup", "minhash", "--min-quality", "0.0"]) == 0
    rep_m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # both modes collapse each 3-copy cluster to one doc and keep the
    # 30 unrelated docs: identical survivor sets
    assert rep_e["after_neardup"] == rep_m["after_neardup"] == 42
    kept_e = sorted(r.doc_id for r in spark.read.parquet(out_e).collect())
    kept_m = sorted(r.doc_id for r in spark.read.parquet(out_m).collect())
    assert kept_e == kept_m

    # the real documents table still runs e2e in minhash mode
    out_r = str(tmp_path / "cur_real")
    assert main(["curate", "--input", f"{sf_dir}/documents.parquet",
                 "--output", out_r, "--neardup", "minhash"]) == 0
    rep_r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (rep_r["input"] >= rep_r["after_exact_dedup"]
            >= rep_r["after_neardup"] >= rep_r["written"] > 0)


def test_curate_custom_columns_both_keep_modes(spark, tmp_path):
    """curate_corpus(text_col=..., id_col=...) must thread the custom
    names through BOTH near-dup branches (the round-5 review found the
    keep='first' branch hardcoding text/doc_id)."""
    from reddit_etl_pipeline_spark.plans.curation import curate_corpus

    rows = [
        (
            i,
            "the engine was running and the tests were green for all of "
            "the cases that we checked in this run " * 3 + f"tail {i % 3}",
        )
        for i in range(9)
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, "post_id long, body string").write.mode(
        "overwrite"
    ).parquet(src)
    for mode in ("first", "best"):
        out = str(tmp_path / f"out_{mode}")
        rep = curate_corpus(
            spark, src, out,
            text_col="body", id_col="post_id",
            min_quality=0.0, keep=mode,
        )
        assert rep["written"] >= 1
        got = spark.read.parquet(out)
        assert "post_id" in got.columns and "body" in got.columns
        # after exact dedup 3 distinct docs remain, and they are mutual
        # near-dups (only the tail digit differs, Jaccard ~ 0.96): one
        # representative survives; with equal quality both modes pick
        # the lowest id
        kept = got.collect()
        assert len(kept) == 1, mode
        assert kept[0]["post_id"] == 0, mode
