"""Tokenizer-construction operators: BPE merge-pair mining and
quantile length bucketing.

Both complete the corpus-preparation family in ``operators/text.py``:
``text_pmi_collocations`` mines word-level merge candidates;
``text_bpe_merge_mine`` here mines CHARACTER-level pair counts — the
statistic behind one byte-pair-encoding merge round (Sennrich et al.
2016): count adjacent symbol pairs across the corpus weighted by word
frequency, and the argmax pair becomes the next merge rule.
``text_length_buckets`` buckets documents by token-count quantiles — the
standard pre-packing step (pair with ``text_pack_sequences``) that bounds
padding waste when batching variable-length sequences.

Scale shapes:
- merge mining aggregates tokens to the DISTINCT-WORD level first (vocab-
  sized, not corpus-sized), generates char pairs ROW-LOCAL from each
  distinct word, and shuffles only (char, char, partial count) cells with
  map-side combine — corpus text never crosses an exchange, and one merge
  round is one slim aggregation regardless of corpus size.
- length bucketing computes boundaries as ONE percentile aggregate
  (mergeable sketch shape; swap in approx_percentile at 100 TB — the
  bucket assignment logic is unchanged), broadcasts the 7 boundary
  doubles, assigns buckets row-local, and aggregates per-bucket stats
  with partial aggregation.  No global sort, no single-partition window
  (NTILE over the corpus — the naive form — would serialize on one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

BPE_TOP = 20
N_BUCKETS = 8
_QS = [i / N_BUCKETS for i in range(1, N_BUCKETS)]  # 7 interior boundaries


@register(
    "text_bpe_merge_mine",
    oracle=f"""
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT word, COUNT(*) AS c FROM toks GROUP BY word
),
wi AS (
  SELECT word, c, UNNEST(range(1, length(word))) AS i
  FROM wc WHERE length(word) >= 2
),
prs AS (
  SELECT substr(word, i, 1) AS sym_a, substr(word, i + 1, 1) AS sym_b, c
  FROM wi
)
SELECT sym_a, sym_b, sym_a || sym_b AS merged,
       CAST(SUM(c) AS BIGINT) AS pair_count
FROM prs GROUP BY sym_a, sym_b
ORDER BY pair_count DESC NULLS LAST,
         sym_a ASC NULLS FIRST, sym_b ASC NULLS FIRST
LIMIT {BPE_TOP}
""",
    doc=f"One BPE merge-mining round: top-{BPE_TOP} adjacent character"
    " pairs by corpus frequency (word-frequency-weighted), the statistic"
    " a byte-pair-encoding trainer maximizes each round.  Scale shape:"
    " tokens collapse to the distinct-word vocabulary FIRST (the only"
    " corpus-sized exchange carries (word, partial count) with map-side"
    " combine); pairs are generated row-local per distinct word via"
    " transform(sequence) — no positional self-join — and the pair"
    " aggregation exchanges alphabet² cells at most; ranking is a"
    " bounded-heap TakeOrderedAndProject.",
)
def text_bpe_merge_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.length("word") >= 2)
    )
    pairs = wc.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.struct(
                    F.col("word").substr(i, F.lit(1)).alias("sym_a"),
                    F.col("word").substr(i + F.lit(1), F.lit(1)).alias("sym_b"),
                ),
            )
        ).alias("pr"),
        "c",
    ).select("pr.sym_a", "pr.sym_b", "c")
    return (
        pairs.groupBy("sym_a", "sym_b")
        .agg(F.sum("c").cast("long").alias("pair_count"))
        .select(
            "sym_a",
            "sym_b",
            F.concat("sym_a", "sym_b").alias("merged"),
            "pair_count",
        )
        .orderBy(
            F.col("pair_count").desc_nulls_last(),
            F.col("sym_a").asc_nulls_first(),
            F.col("sym_b").asc_nulls_first(),
        )
        .limit(BPE_TOP)
    )


@register(
    "text_length_buckets",
    oracle=f"""
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
q AS (
  SELECT quantile_cont(n_tokens, {_QS}) AS bs FROM d
),
b AS (
  SELECT doc_id, n_tokens,
         1 + len(list_filter(bs, x -> n_tokens > x)) AS bucket
  FROM d, q
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS pad_waste
FROM b GROUP BY bucket
ORDER BY bucket ASC NULLS FIRST
""",
    doc=f"Quantile length bucketing for batch packing: documents split"
    f" into {N_BUCKETS} token-count buckets at exact octile boundaries,"
    " reporting per-bucket size stats and the padding waste"
    " (n_docs × bucket_max − sum_tokens) a naive pad-to-max batcher"
    " would pay — the pre-packing analysis that pairs with"
    " text_pack_sequences.  Boundaries agree bit-for-bit across engines:"
    " linear-interpolated percentiles of INTEGER counts at k/8 fractions"
    " are exact in binary floating point.  Scale shape: one percentile"
    " aggregate (use approx_percentile at 100 TB; assignment unchanged),"
    " a 7-double broadcast, row-local bucket assignment, partial-agg"
    " stats — never a global NTILE window, which would serialize the"
    " corpus through one task.",
)
def text_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    q = d.agg(
        F.percentile("n_tokens", F.array(*[F.lit(x) for x in _QS])).alias("bs")
    )
    b = d.join(F.broadcast(q), F.lit(True)).select(
        "n_tokens",
        (
            1 + F.size(F.filter("bs", lambda x: F.col("n_tokens") > x))
        ).alias("bucket"),
    )
    return (
        b.groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens"))
            .cast("long")
            .alias("pad_waste"),
        )
        .orderBy(F.col("bucket").asc_nulls_first())
    )


VOCAB_BUDGETS = [1, 2, 4, 8, 16, 32]  # log-spaced candidate vocab sizes


@register(
    "text_vocab_coverage",
    oracle=f"""
WITH wc AS (
  SELECT word, COUNT(*) AS c
  FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM wc),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word ASC) AS rank
  FROM wc
  ORDER BY c DESC NULLS LAST, word ASC NULLS FIRST
  LIMIT {max(VOCAB_BUDGETS)}
),
cum AS (
  SELECT rank,
         CAST(SUM(c) OVER (ORDER BY rank) AS BIGINT) AS covered_tokens
  FROM ranked
)
SELECT CAST(rank AS BIGINT) AS vocab_size, covered_tokens,
       (covered_tokens * 1000) // t AS coverage_p1000
FROM cum, tot
WHERE rank IN ({", ".join(str(v) for v in VOCAB_BUDGETS)})
ORDER BY vocab_size ASC NULLS FIRST
""",
    doc=f"Vocabulary coverage curve: for log-spaced vocab budgets"
    f" {VOCAB_BUDGETS}, the corpus token share the top-V words cover —"
    " the table a tokenizer designer reads to pick V (coverage_p1000's"
    " complement is the OOV rate the UNK token absorbs).  Pairs with"
    " text_bpe_merge_mine (subword path) and text_heavy_hitters (sketch"
    " path); this is the exact integer contract.  Scale shape: corpus"
    " collapses to the (word, count) vocabulary via one partial-agg"
    " exchange; the top-V cut is a bounded-heap TakeOrderedAndProject"
    " (never a global sort of the vocab); the cumulative sum runs on V"
    " rows (<= 32) in a single trivial window; the grand total arrives"
    " by 1-row broadcast.  All integer arithmetic after the counts.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = wc.agg(F.sum("c").cast("long").alias("t"))
    top = (
        wc.orderBy(F.col("c").desc_nulls_last(), F.col("word").asc_nulls_first())
        .limit(max(VOCAB_BUDGETS))
    )
    w = Window.orderBy(F.col("c").desc_nulls_last(), F.col("word").asc_nulls_first())
    cum = top.select(
        F.row_number().over(w).alias("vocab_size"),
        F.sum("c").over(w).cast("long").alias("covered_tokens"),
    ).filter(F.col("vocab_size").isin(VOCAB_BUDGETS))
    return (
        cum.join(F.broadcast(tot), F.lit(True))
        .select(
            F.col("vocab_size").cast("long").alias("vocab_size"),
            "covered_tokens",
            F.expr("(covered_tokens * 1000) div t").alias("coverage_p1000"),
        )
        .orderBy(F.col("vocab_size").asc_nulls_first())
    )


BPE_MERGES = 8  # rank-ordered merge rules applied by the encoder


def _bpe_pass_sql(k: int) -> str:
    """One merge pass over ``syms`` for merge rank ``k`` (1-based), as a
    DuckDB list expression.  Greedy left-to-right is PARALLEL here because
    encode merges are restricted to sym_a <> sym_b: a match at i and i+1
    would need syms[i+1] = sym_b = sym_a, so matches never overlap — the
    mask needs no sequential scan.  An element is consumed iff its left
    neighbor started a merge (which, for a <> b, always fires when the
    pair matches)."""
    a, b = f"merges[{k}].sym_a", f"merges[{k}].sym_b"
    return f"""list_filter(list_transform(range(1, len(syms) + 1), i ->
      CASE WHEN syms[i] = {a} AND syms[i + 1] = {b} THEN {a} || {b}
           WHEN i > 1 AND syms[i - 1] = {a} AND syms[i] = {b} THEN NULL
           ELSE syms[i] END), x -> x IS NOT NULL)"""


def _bpe_encode_oracle() -> str:
    passes = "".join(
        f",\ne{k} AS (SELECT word, c, {_bpe_pass_sql(k)} AS syms, merges FROM e{k - 1})"
        for k in range(1, BPE_MERGES + 1)
    )
    return f"""
WITH wc AS (
  SELECT word, COUNT(*) AS c
  FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
prs AS (
  SELECT substr(word, i, 1) AS sym_a, substr(word, i + 1, 1) AS sym_b,
         SUM(c) AS pc
  FROM (SELECT word, c, UNNEST(range(1, length(word))) AS i
        FROM wc WHERE length(word) >= 2)
  GROUP BY sym_a, sym_b
),
ranked AS (
  SELECT sym_a, sym_b,
         ROW_NUMBER() OVER (ORDER BY pc DESC, sym_a ASC, sym_b ASC) AS rank
  FROM prs WHERE sym_a <> sym_b
  ORDER BY pc DESC NULLS LAST, sym_a ASC NULLS FIRST, sym_b ASC NULLS FIRST
  LIMIT {BPE_MERGES}
),
m AS (
  SELECT list(struct_pack(rank := rank, sym_a := sym_a, sym_b := sym_b)
              ORDER BY rank) AS merges
  FROM ranked
),
e0 AS (
  SELECT word, c,
         list_transform(range(1, length(word) + 1),
                        i -> substr(word, i, 1)) AS syms,
         merges
  FROM wc, m
){passes},
enc AS (SELECT word, len(syms) AS n_tok_word FROM e{BPE_MERGES}),
dw AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
)
SELECT dw.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(dw.word)) AS BIGINT) AS n_sym,
       CAST(SUM(enc.n_tok_word) AS BIGINT) AS n_tok,
       (CAST(SUM(enc.n_tok_word) AS BIGINT) * 1000)
         // CAST(SUM(length(dw.word)) AS BIGINT) AS ratio_p1000
FROM dw JOIN enc ON dw.word = enc.word
WHERE dw.word <> ''
GROUP BY dw.doc_id
ORDER BY doc_id ASC NULLS FIRST
"""


def _bpe_pass_col(st, m):
    """Spark twin of :func:`_bpe_pass_sql`: one parallel merge pass as a
    higher-order expression (runs inside the aggregate fold, so the
    expression appears ONCE in the plan — chained withColumns would let
    CollapseProject inline each pass into the next, the exponential-
    codegen trap pinned for text_contamination_check)."""
    a, b = m["sym_a"], m["sym_b"]
    step = F.transform(
        F.sequence(F.lit(0), F.size(st) - 1),
        lambda i: F.when(
            (F.get(st, i) == a) & (F.get(st, i + 1) == b), F.concat(a, b)
        )
        .when(
            (i > 0) & (F.get(st, i - 1) == a) & (F.get(st, i) == b),
            F.lit(None).cast("string"),
        )
        .otherwise(F.get(st, i)),
    )
    return F.filter(step, lambda x: x.isNotNull())


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    doc=f"BPE ENCODE — the consumer step of text_bpe_merge_mine: apply the"
    f" top-{BPE_MERGES} mined merge rules (rank-ordered, sym_a <> sym_b"
    " so passes parallelize; see _bpe_pass_sql) to every word and report"
    " per-document symbol counts before/after and the compression ratio."
    "  Scale shape: encoding runs over the DISTINCT-WORD vocabulary, not"
    " the corpus (each word encodes once); the merge table is a bounded"
    f" {BPE_MERGES}-row list broadcast as one row; passes fold inside ONE"
    " aggregate expression (no chained projections, no exponential"
    " codegen); per-doc stats arrive via a (word → encoded length) join"
    " and partial-agg rollup — document text never carries encodings"
    " across an exchange.",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    dw = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    wc = dw.groupBy("word").agg(F.count(F.lit(1)).alias("c"))

    prs = (
        wc.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.struct(
                        F.col("word").substr(i, F.lit(1)).alias("sym_a"),
                        F.col("word")
                        .substr(i + F.lit(1), F.lit(1))
                        .alias("sym_b"),
                    ),
                )
            ).alias("pr"),
            "c",
        )
        .select("pr.sym_a", "pr.sym_b", "c")
        .groupBy("sym_a", "sym_b")
        .agg(F.sum("c").alias("pc"))
        .filter(F.col("sym_a") != F.col("sym_b"))
    )
    order = [
        F.col("pc").desc_nulls_last(),
        F.col("sym_a").asc_nulls_first(),
        F.col("sym_b").asc_nulls_first(),
    ]
    ranked = (
        prs.orderBy(*order)
        .limit(BPE_MERGES)
        .select(
            F.row_number().over(Window.orderBy(*order)).alias("rank"),
            "sym_a",
            "sym_b",
        )
    )
    mrow = ranked.agg(
        F.array_sort(F.collect_list(F.struct("rank", "sym_a", "sym_b"))).alias(
            "merges"
        )
    )

    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    enc = (
        wc.join(F.broadcast(mrow), F.lit(True))
        .select(
            "word",
            F.size(
                F.aggregate(F.col("merges"), chars, _bpe_pass_col)
            ).alias("n_tok_word"),
        )
    )
    return (
        dw.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_sym"),
            F.sum("n_tok_word").cast("long").alias("n_tok"),
            F.expr(
                "(CAST(SUM(n_tok_word) AS BIGINT) * 1000)"
                " div CAST(SUM(length(word)) AS BIGINT)"
            ).alias("ratio_p1000"),
        )
        .orderBy(F.col("doc_id").asc_nulls_first())
    )
