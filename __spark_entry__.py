"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: BM25 top-20 over sf0.001 documents with
doc-store join-back (the reference's two-phase retrieve,
/root/reference/src/inverted_index.rs:179-232).

``queries()`` / ``oracle_sql()`` — each implemented operator from
SURVEY.md §2 as a (Spark DataFrame, DuckDB SQL) pair over the same parquet.
Tokenization parity: both sides use the exact regex
``[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n\\r\\f\\v]`` on lower(text) (the
reference Simple-tokenizer semantics restricted to an ASCII word class so
Java-regex and RE2 agree; see stractt_spark/functions/tokenizer.py).
BM25: k1=1.2 b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5)), dl byte-quantized
through the 256-entry fieldnorm table (stractt_spark/functions/fieldnorm.py).
Scores are rounded to 4dp on both sides; ordering is (score desc, doc_id
asc) before the top-k cut so the cut is deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"

# exact-parity ASCII token pattern (Java regex == RE2 semantics here)
TOKEN_RE = "[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n\\r\\f\\v]"

# 256-row fieldnorm decode table as SQL (DuckDB): b<8 → b, else (m|8)<<(e-1)
_NORM_CTE = (
    "norm(b, v) AS (SELECT b, CASE WHEN b < 8 THEN b "
    "ELSE CAST(((b % 8) + 8) * power(2, b // 8 - 1) AS BIGINT) END "
    "FROM generate_series(0, 255) AS g(b))"
)

_TOKS_CTE = (
    "toks AS (SELECT d.doc_id AS doc_id, t.term AS term "
    "FROM documents d, unnest(regexp_extract_all(lower(d.text), "
    f"'{TOKEN_RE}')) AS t(term))"
)
_TF_CTE = "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term)"
_DL_CTE = "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id)"
_DLQ_CTE = (
    "dlq AS (SELECT dl.doc_id, dl.dl, "
    "(SELECT max(v) FROM norm WHERE v <= dl.dl) AS dl_quant, "
    "(SELECT max(b) FROM norm WHERE v <= dl.dl) AS norm_id FROM dl)"
)
_STATS_CTE = (
    "stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs, "
    "(SELECT CAST(sum(dl) AS DOUBLE) FROM dl) / (SELECT count(*) FROM documents) AS avgdl)"
)


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stractt_spark.operators.postings import build_postings

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_postings(docs, text_col="text", id_col="doc_id", analyzer="ascii")


def _engine(spark: SparkSession, sf_dir: str):
    from stractt_spark.plans.engine import SearchEngine

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return SearchEngine.from_docs(
        docs, text_col="text", id_col="doc_id", analyzer="ascii", cache=False
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-20 BM25 for a two-term OR query + doc-store join."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    eng = _engine(spark, SF0001)
    top = eng.search("merge sort", k=20, mode="should")
    return (
        top.join(docs.select("doc_id", "text", "lang"), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", F.round("score", 4).alias("score"), "lang", "text")
    )


# ---------------------------------------------------------------- queries

def _q_postings_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _postings(spark, sf_dir)
        .select(
            "term",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("tf").cast("long").alias("tf"),
        )
    )


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stractt_spark.operators.postings import doc_stats

    return doc_stats(_postings(spark, sf_dir)).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("dl").cast("long").alias("dl"),
        F.col("norm_id").cast("long").alias("norm_id"),
    )


def _q_term_df_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    p = _postings(spark, sf_dir)
    return (
        p.groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumn(
            "idf",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                ),
                6,
            ),
        )
        .select("term", F.col("df").cast("long").alias("df"), "idf")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
    )


def _bm25_query(terms: list[str], mode: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = _engine(spark, sf_dir)
        top = eng.search(" ".join(terms), k=10, mode=mode)
        return top.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )

    return run


def _bm25_sql(terms: list[str], mode: str) -> str:
    tlist = ", ".join("'" + t + "'" for t in terms)
    per_term = (
        "SELECT tf.doc_id, tf.term, "
        "ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * 2.2 * tf.tf / "
        "(tf.tf + 1.2 * (0.25 + 0.75 * q.dl_quant / s.avgdl)) AS ts "
        "FROM tf JOIN dlq q ON tf.doc_id = q.doc_id "
        "JOIN (SELECT term, count(*) AS df FROM tf GROUP BY term) df ON tf.term = df.term "
        "CROSS JOIN stats s "
        f"WHERE tf.term IN ({tlist})"
    )
    must = f"HAVING count(DISTINCT term) = {len(terms)}" if mode == "must" else ""
    return (
        f"WITH {_NORM_CTE}, {_TOKS_CTE}, {_TF_CTE}, {_DL_CTE}, {_DLQ_CTE}, "
        f"{_STATS_CTE}, per_term AS ({per_term}) "
        "SELECT doc_id, round(sum(ts), 4) AS score FROM per_term "
        f"GROUP BY doc_id {must} "
        "ORDER BY sum(ts) DESC, doc_id ASC LIMIT 10"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "postings_tf": _q_postings_tf,
        "doc_stats": _q_doc_stats,
        "term_df_idf": _q_term_df_idf,
        "bm25_top10_the": _bm25_query(["the"], "should"),
        "bm25_top10_and": _bm25_query(["merge", "sort"], "must"),
        "bm25_top10_or": _bm25_query(["hash", "join"], "should"),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "postings_tf": (
            f"WITH {_TOKS_CTE} SELECT term, doc_id, count(*) AS tf "
            "FROM toks GROUP BY term, doc_id"
        ),
        "doc_stats": (
            f"WITH {_NORM_CTE}, {_TOKS_CTE}, {_DL_CTE}, {_DLQ_CTE} "
            "SELECT doc_id, dl, norm_id FROM dlq"
        ),
        "term_df_idf": (
            f"WITH {_TOKS_CTE}, {_TF_CTE} "
            "SELECT term, count(*) AS df, "
            "round(ln(1 + ((SELECT count(*) FROM documents) - count(*) + 0.5) "
            "/ (count(*) + 0.5)), 6) AS idf "
            "FROM tf GROUP BY term ORDER BY df DESC, term ASC LIMIT 50"
        ),
        "bm25_top10_the": _bm25_sql(["the"], "should"),
        "bm25_top10_and": _bm25_sql(["merge", "sort"], "must"),
        "bm25_top10_or": _bm25_sql(["hash", "join"], "should"),
    }
