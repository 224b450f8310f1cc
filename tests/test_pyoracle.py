"""The scalar plain-Python oracles must agree element-wise with the
vectorized Spark operators — this equivalence is what licenses the driver
gates that replay the oracles into expected-result parquet."""

import pytest

from stractt_spark.operators.dedup import simhash64
from stractt_spark.operators.textstats import doc_fingerprint
from stractt_spark.pyoracle import fingerprint_py, simhash64_py
from stractt_spark.sources.corpus import make_corpus


@pytest.fixture(scope="module")
def docs(spark):
    rows = make_corpus(120)
    rows.append({"repo": "r", "path": "p", "commit": "c", "content": ""})
    rows.append({"repo": "r", "path": "p2", "commit": "c", "content": "one token"})
    return (
        spark.createDataFrame(
            [(i, r["content"]) for i, r in enumerate(rows)],
            "doc_id long, text string",
        ),
        rows,
    )


def test_simhash_matches_pyoracle(docs):
    df, rows = docs
    got = {r["doc_id"]: r["simhash"] for r in simhash64(df, "text", "doc_id").collect()}
    for i, r in enumerate(rows):
        expected = simhash64_py(r["content"])
        if expected is None:
            assert i not in got  # token-less docs omitted
        else:
            assert got[i] == expected, i


def test_fingerprint_matches_pyoracle(docs):
    df, rows = docs
    got = {
        r["doc_id"]: r["fingerprint"]
        for r in doc_fingerprint(df, "text", "doc_id").collect()
    }
    for i, r in enumerate(rows):
        assert got[i] == fingerprint_py(r["content"]), i
