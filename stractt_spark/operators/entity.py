"""Entity index (reference ``src/entity_index/mod.rs`` + ``entity.rs``).

The reference keeps a SEPARATE small tantivy index of entities — title +
abstract text fields, bincoded ``info``/``links`` payloads, and a
``has_image`` flag field (mod.rs:58-95) — searched with per-token
**Must on title + Should on abstract** after dropping the top-50 English
stopwords (mod.rs:271-305), returning the single best entity plus
MoreLikeThis related entities restricted to image-bearing docs
(mod.rs:238-269) and per-attribute occurrence counts kept in a RocksDB
KV (mod.rs:203-209, 366-368).

Spark-first re-expression — the entity corpus is just ONE more
multi-field index:

* title/abstract are per-field postings (the existing fused MF build),
  ``has_image`` is an ``img`` attr term — so entity search rides the
  persisted per-field kernel with ``must_fields=["title"]`` (candidates
  must hold every query token in the TITLE; the abstract still scores,
  exactly the reference's Must/Should split).
* the entity STORE (title/info/links payloads the reference keeps as
  tantivy stored fields) is a parquet table; results (≤ k rows) are
  broadcast-joined onto it, never the reverse.
* attribute occurrences are one groupBy over ``map_keys(info)`` — the
  KV's full-scan shape, one shuffle, exact.
* related entities = a Should-union query of the source entity's own
  terms (the MoreLikeThis analogue: every distinct term of
  title+abstract with ``len >= min_word_length``; the reference sets
  min_doc_frequency=1 / min_term_frequency=1 / min_word_length=2, so no
  frequency cut applies) + MustNot ``img:false`` (binary attr ≡ Must
  ``has_image``).  Candidates come from the pruned posting scan of those
  terms — never a full corpus pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.query_parse import parse_query
from ..functions.tokenizer import SQL_TOKEN_PATTERN
from .multifield import MultiFieldSegmentIndex, build_index_fused_multifield
from .segments import attr_term

# The reference loads the first 50 lines of stopwords/English.txt
# lowercased (mod.rs:178-182); this is the standard top-50 English
# stopword ranking (same public word-frequency list family).
ENTITY_STOPWORDS: frozenset[str] = frozenset(
    """the of and a to in is you that it he was for on are as with his
    they i at be this have from or one had by word but not what all were
    we when your can said there use an each which she do how their
    if""".split()
)

ENTITY_FIELDS = {"title": "title", "abstract": "abstract"}
# tantivy's default: no per-field boosts on the entity schema
ENTITY_BOOSTS = {"title": 1.0, "abstract": 1.0}

_STORE = "entity_store.parquet"


def synthesize_entities(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic entity table derived from a documents table (the
    sandbox has no wikipedia dump, so tests/gates synthesize one —
    every transform is plain column arithmetic reproducible in ANSI SQL
    for the DuckDB oracle):

    * ``title``  — the doc's first 3 analyzed tokens (short name field)
    * ``abstract`` — the full doc text
    * ``info``   — 1-3 attributes keyed ``attr{(id+j) % 7}`` (consecutive
      offsets, so keys never collide within one entity)
    * ``has_image`` — every third entity
    """
    d = F.col(id_col)
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(SQL_TOKEN_PATTERN), 0
    )
    nattr = d % 3  # sequence(0, nattr) => 1..3 attributes
    keys = F.transform(
        F.sequence(F.lit(0).cast("long"), nattr),
        lambda j: F.concat(F.lit("attr"), ((d + j) % 7).cast("string")),
    )
    vals = F.transform(
        F.sequence(F.lit(0).cast("long"), nattr),
        lambda j: F.concat(F.lit("v"), ((d * (j + 1)) % 100).cast("string")),
    )
    return docs.select(
        d.cast("long").alias("entity_id"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("title"),
        F.col(text_col).alias("abstract"),
        F.map_from_arrays(keys, vals).alias("info"),
        (d % 3 == 0).alias("has_image"),
    )


def build_entity_index(
    spark: SparkSession,
    entities: DataFrame,
    out_dir: str,
    analyzer: str = "ascii",
    docs_per_segment: int = 4096,
) -> None:
    """Build the entity index: per-field postings for title/abstract, an
    ``img`` attr term for the has_image Must filter, and the entity
    store parquet (the reference's stored fields + RocksDB attributes,
    mod.rs:58-95).  One fused build pass — the entity corpus is tiny
    next to the web corpus (the reference bulk-loads it offline too)."""
    import os

    with_img = entities.withColumn(
        "img", F.when(F.col("has_image"), "true").otherwise("false")
    )
    build_index_fused_multifield(
        spark, with_img, out_dir, ENTITY_FIELDS,
        id_col="entity_id", analyzer=analyzer,
        docs_per_segment=docs_per_segment,
        field_boosts=ENTITY_BOOSTS, attr_cols=["img"],
    )
    entities.select(
        "entity_id", "title", "abstract", "info", "has_image"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, _STORE))


class EntityIndex:
    """Open handle over a built entity index (mirrors
    ``EntityIndex::open``, mod.rs:160-201)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        import os

        self.spark = spark
        self.mf = MultiFieldSegmentIndex(spark, root)
        self.store = spark.read.parquet(os.path.join(root, _STORE))

    def _with_store(self, top: DataFrame) -> DataFrame:
        """Attach stored entity fields to a ≤k-row result (broadcast the
        RESULT side — the store can be arbitrarily large)."""
        t = F.broadcast(top.withColumnRenamed("doc_id", "entity_id"))
        return (
            t.join(self.store.select("entity_id", "title"), "entity_id")
            .orderBy(F.col("score").desc(), F.col("entity_id").asc())
            .select("entity_id", "title", "score")
        )

    def search(self, query: str, k: int = 1) -> DataFrame:
        """Best-entity lookup (mod.rs:271-305): analyze the query, drop
        stopword tokens, then per remaining token Must(title) +
        Should(abstract); top-1 by summed BM25 (tantivy folds Must and
        Should clause scores together).  All tokens stopwords → empty
        (the reference returns None)."""
        pq = parse_query(query, self.mf.analyzer)
        kept = [t for t in pq.pos_terms if t not in ENTITY_STOPWORDS]
        if not kept:
            return self.spark.createDataFrame(
                [], "entity_id long, title string, score double"
            )
        top = self.mf.search(
            " ".join(kept), k=k, mode="must", must_fields=["title"]
        )
        return self._with_store(top)

    def related_entities(
        self, entity_id: int, k: int = 4, min_word_length: int = 2
    ) -> DataFrame:
        """MoreLikeThis analogue (mod.rs:238-269): Should-union of every
        distinct analyzed term of the source entity's title+abstract with
        ``len >= min_word_length``, Must has_image (MustNot the binary
        ``img:false`` attr term), source excluded, top k.  The source
        row fetch is a 1-row pushed-predicate read; candidates come from
        the pruned posting scan of the term set."""
        an = self.mf.analyzer
        from ..functions.tokenizer import get_analyzer

        analyze = get_analyzer(an)
        src = (
            self.store.filter(F.col("entity_id") == entity_id)
            .select("title", "abstract").collect()
        )
        if not src:
            raise KeyError(f"entity {entity_id} not in store")
        terms = sorted({
            t
            for text in (src[0]["title"], src[0]["abstract"])
            for t in analyze(text)
            if len(t) >= min_word_length
        })
        if not terms:
            return self.spark.createDataFrame(
                [], "entity_id long, title string, score double"
            )
        top = self.mf.search(
            " ".join(terms), k=k + 1, mode="should",
            _extra_neg=[attr_term("img", "false")],
        )
        out = self._with_store(top)
        return (
            out.filter(F.col("entity_id") != entity_id)
            .orderBy(F.col("score").desc(), F.col("entity_id").asc())
            .limit(k)
        )

    def attribute_occurrences(self) -> DataFrame:
        """How many entities carry each info attribute (the reference
        increments a RocksDB counter per insert, mod.rs:203-209; the
        batch shape is one exact groupBy over the store)."""
        return (
            self.store.select(
                F.explode(F.map_keys("info")).alias("attribute")
            )
            .groupBy("attribute")
            .agg(F.count("*").alias("occurrences"))
            .orderBy("attribute")
        )
