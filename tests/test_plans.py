"""Physical-plan assertions: the optimizations we rely on must actually
appear in the executed plans (predicate pushdown, column pruning, bounded
top-k, broadcast joins) — .explain as a regression gate, not a vibe."""

import pytest

from stractt_spark.plans.build import SegmentIndex


def _formatted_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def idx(spark):
    # dedicated index dir: other tests .cache() DataFrames over shared
    # paths, and Spark substitutes cached InMemoryRelations into matching
    # plans — which erases the parquet scans these assertions inspect
    import shutil

    from stractt_spark.plans.build import build_index_fused
    from stractt_spark.sources.corpus import make_corpus

    path = "/tmp/stractt_plans_idx"
    rows = make_corpus(300)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)],
        "doc_id long, content string",
    )
    shutil.rmtree(path, ignore_errors=True)
    build_index_fused(spark, docs, path, docs_per_segment=96, positions=True)
    return SegmentIndex(spark, path)


def test_term_filter_pushed_to_scan(idx):
    plan = _formatted_plan(idx.search("merge sort", k=10))
    assert "PushedFilters" in plan
    assert "In(term, [merge,sort])" in plan.replace("  ", " ")


def test_nonphrase_query_prunes_position_column(idx):
    plan = _formatted_plan(idx.search("merge sort", k=10))
    # segments scan ReadSchema must NOT include pos_bytes for term queries
    seg_scan = [
        seg for seg in plan.split("(")
        if "ReadSchema" in seg and "id_bytes" in seg and "max_tf" in seg
    ]
    assert seg_scan and all("pos_bytes" not in s for s in seg_scan)
    # ...but a phrase query reads it
    plan_ph = _formatted_plan(idx.search("merge.sort", k=10, phrase=True))
    assert "pos_bytes" in plan_ph


def test_final_topk_is_take_ordered(idx):
    plan = _formatted_plan(idx.search("the", k=10, mode="should"))
    assert "TakeOrderedAndProject" in plan


def test_norms_scan_prunes_columns(idx):
    plan = _formatted_plan(idx.search("buffer", k=10))
    # the norms side must not read tf_bytes/max_tf etc.
    norm_scans = [
        seg for seg in plan.split("(")
        if "ReadSchema" in seg and "first_doc_id" in seg and "max_tf" not in seg
    ]
    assert norm_scans, "no pruned norms scan found"


def test_exhaustive_path_pushdown(spark):
    from stractt_spark.plans.engine import SearchEngine
    from stractt_spark.sources.corpus import make_corpus

    rows = make_corpus(100)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)], "doc_id long, content string"
    )
    eng = SearchEngine.from_docs(docs, cache=False)
    plan = _formatted_plan(eng.search("merge sort", k=5))
    assert "TakeOrderedAndProject" in plan
    # doc scan pruned to (doc_id, content) only
    assert "ReadSchema" not in plan or "lang" not in plan
