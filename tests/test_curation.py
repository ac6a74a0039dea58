"""Invariant tests for the corpus-curation operators — properties the
DuckDB hash oracle implies but does not state, so a future refactor that
changes semantics (not just values) fails with a readable message."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.pipeline.curation import (
    DECON_MOD,
    DOMAIN_QUOTA,
    PACK_BUDGET,
    benchmark_decontamination,
    domain_quota_cap,
    pii_redaction,
    repetition_filter,
    sequence_packing,
    url_dedup,
)


def test_decontamination_reports_only_train_docs(spark, sf_dir):
    rows = benchmark_decontamination(spark, sf_dir).collect()
    assert rows, "fixture must produce at least one contaminated doc"
    for r in rows:
        assert r.doc_id % DECON_MOD != 0, "benchmark docs must not self-report"
        assert r.n_shared_ngrams >= 1
        assert r.n_benchmark_docs >= 1


def test_pii_counts_follow_injection_rule(spark, sf_dir):
    for r in pii_redaction(spark, sf_dir).collect():
        if r.doc_id % 5 == 0:
            assert (r.n_emails, r.n_phones) == (1, 1), r
        else:
            assert (r.n_emails, r.n_phones) == (0, 0), r


def test_repetition_fractions_bounded_and_flag_consistent(spark, sf_dir):
    rows = repetition_filter(spark, sf_dir).collect()
    keeps = {r.keep for r in rows}
    assert keeps == {True, False}, "thresholds must split the corpus"
    for r in rows:
        assert 0.0 <= r.top_token_frac <= 1.0001
        assert 0.0 <= r.dup_bigram_frac <= 1.0001


def test_sequence_packing_offsets_are_prefix_sums(spark, sf_dir):
    rows = sequence_packing(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for docs in by_source.values():
        docs.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in docs:
            assert r.stream_offset == offset, r
            assert r.seq_id == offset // PACK_BUDGET
            end_seq = (offset + r.n_tokens - 1) // PACK_BUDGET
            assert r.spans_boundary == (end_seq > r.seq_id)
            offset += r.n_tokens


def test_domain_quota_cap_bounds_and_orders(spark, sf_dir):
    rows = domain_quota_cap(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    docs_total = load(spark, sf_dir, "documents")
    per_source = {
        r.source: r.n
        for r in docs_total.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for source, docs in by_source.items():
        assert len(docs) == min(DOMAIN_QUOTA, per_source[source])
        docs.sort(key=lambda r: r.quality_rank)
        lens = [r.n_chars for r in docs]
        assert lens == sorted(lens, reverse=True), f"{source} not longest-first"


def test_url_dedup_partitions_the_corpus(spark, sf_dir):
    rows = url_dedup(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_duplicates for r in rows) == n_docs
    for r in rows:
        host = r.canonical_url.split("/")[2]
        assert host == host.lower()
        assert "?" not in r.canonical_url and "#" not in r.canonical_url
