"""Round-8-prepared operators, held to the driver-identical comparison
contract NOW (see flink_cookbook_spark/pipeline/prepared.py for why
their register() calls are deferred one round)."""

from __future__ import annotations

import pytest

from flink_cookbook_spark.pipeline.prepared import PREPARED_R8
from tests.oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(PREPARED_R8))
def test_prepared_matches_oracle(name, spark, sf_dir, con):
    fn, oracle = PREPARED_R8[name]
    df = fn(spark, sf_dir)
    problems = compare(df, con, oracle, name)
    assert not problems, "\n".join(problems)
    # the vacuous-green lint, applied early: a prepared query must have
    # a non-empty answer at the fixture SF or it cannot register
    assert df.count() > 0, f"{name}: empty at fixture SF — vacuous oracle"


def test_asof_tolerance_actually_filters(spark, sf_dir):
    """The tolerance must do work on the fixture: some purchases have a
    fresh view (non-null), some have only a stale or missing one."""
    from flink_cookbook_spark.pipeline.prepared import asof_tolerance_join

    rows = asof_tolerance_join(spark, sf_dir).collect()
    fresh = sum(1 for r in rows if r.fresh)
    assert 0 < fresh < len(rows), (fresh, len(rows))
    for r in rows:
        if r.fresh:
            assert r.view_t_fresh is not None and r.t - r.view_t_fresh <= 3600
        else:
            assert r.view_t_fresh is None and r.view_value_fresh is None


def test_split_is_total_and_stratified(spark, sf_dir):
    """Every document lands in exactly one split, and per-stratum shares
    sum to 1 with the train split dominating."""
    from flink_cookbook_spark.catalog import load
    from flink_cookbook_spark.pipeline.prepared import stratified_split_manifest

    rows = stratified_split_manifest(spark, sf_dir).collect()
    n_total = sum(r.n_docs for r in rows)
    assert n_total == load(spark, sf_dir, "documents").count()
    by_stratum: dict = {}
    for r in rows:
        by_stratum.setdefault((r.lang, r.source), []).append(r)
    for rs in by_stratum.values():
        assert abs(sum(x.stratum_share for x in rs) - 1.0) < 1e-3
        splits = {x.split: x.n_docs for x in rs}
        # dominance is an EXPECTATION (80/10/10 via a fair coin): tiny
        # strata can legitimately land val-heavy, so only assert where
        # the sample is big enough for the margin to be overwhelming
        if sum(splits.values()) >= 50:
            assert splits.get("train", 0) >= splits.get("val", 0)
            assert splits.get("train", 0) >= splits.get("test", 0)
    # global shares must track 80/10/10
    totals: dict = {}
    for r in rows:
        totals[r.split] = totals.get(r.split, 0) + r.n_docs
    assert abs(totals.get("train", 0) / n_total - 0.8) < 0.1


def test_pq_code_compresses_and_reconstructs(spark, sf_dir):
    """PQ codes must live in the trained code space and the
    reconstruction error must be finite and nonzero (lossy by nature)."""
    from flink_cookbook_spark.pipeline.prepared import pq_reconstruction_manifest

    rows = pq_reconstruction_manifest(spark, sf_dir).collect()
    assert rows
    assert all(r.ca >= 0 and r.cb >= 0 for r in rows)
    assert all(r.mse >= 0 for r in rows)
    assert any(r.mse > 0 for r in rows)


def test_prepared_names_do_not_collide_with_registry():
    """A prepared name colliding with a registered query would make the
    round-8 activation a duplicate-registration error; also hold
    prepared oracles to the HUGEINT lint early (same DESCRIBE check the
    registry enforces)."""
    import duckdb

    from flink_cookbook_spark.registry import all_specs
    from tests.conftest import SF_DIR

    registered = set(all_specs())
    clashes = registered & set(PREPARED_R8)
    assert not clashes, clashes
    con = duckdb_connection(SF_DIR)
    offenders = []
    for name, (_, oracle) in sorted(PREPARED_R8.items()):
        for col, typ, *_ in con.execute("DESCRIBE " + oracle).fetchall():
            if "HUGEINT" in typ.upper():
                offenders.append(f"{name}.{col}: {typ}")
    con.close()
    assert not offenders, offenders
