package graft.pipeline

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Training-data pipeline operators Q40–Q48 (north-star extensions;
  * BASELINE.json `north_star`): exact + near-duplicate detection, similarity
  * search, and text analysis over the `documents` / `embeddings` fixtures.
  *
  * Every operator is expressed as shuffles over keys — no all-pairs joins, no
  * driver-side collection:
  *   - exact dedup: one hash shuffle on md5(normalized text);
  *   - MinHash near-dup: shingle → signature → LSH band buckets; candidate
  *     pairs come from equi-joins on (band, band-key), then an exact Jaccard
  *     verify join restricted to candidates. Never O(n²).
  *   - cosine top-k: brute-force against a broadcast query set (k·N work,
  *     the right baseline shape), plus an IVF variant that prunes to one
  *     centroid bucket per query — the 100 TB path.
  *
  * Cross-engine determinism: string hashes are `md5 → hex→digit translate →
  * BIGINT` (identical in Spark and DuckDB); float dot products are
  * sequential left folds in both engines (verified bitwise-identical), so
  * cosine scores compare exactly with no rounding.
  */
object PipelineQueries {

  // ---- shared building blocks -------------------------------------------

  /** Portable string hash — Spark side is the codegen'd
    * [[graft.functions.TextOps.portableHash]] kernel; this is its SQL twin.
    */
  private[graft] val StrHashSql =
    "CAST(translate(substr(md5(%s), 1, 12), 'abcdef', '123456') AS BIGINT)"

  /** MinHash family: (i, a, b) for h_i = (a*h + b) mod P — sourced from the
    * kernel so the row-level signature and the oracle literals can never
    * drift apart.
    */
  private val Family = TextOps.MinhashFamily
  private val MinhashP = TextOps.MinhashP
  private val BandRows = 3 // 12 hashes → 4 bands of 3
  private[pipeline] val JaccardThreshold = 0.6

  /** Operating limit on LSH band-bucket cardinality (q41/q49): a bucket
    * larger than this is DROPPED from candidate generation on both engines
    * (the cap is mirrored in the oracle SQL, so the correctness gate is
    * data-independent). Without a cap, a hot bucket — boilerplate or
    * near-empty docs all sharing one band value — goes quadratic inside a
    * single reducer: the sf0.1 simhash corpus already produces an 811-doc
    * bucket (≈330k pairs from one key). Dropping is the standard production
    * trade (recall bounded by the remaining bands); oversized buckets are
    * auditable via [[oversizedBuckets]].
    */
  private[graft] val MaxBandBucket = 256

  /** Keep only rows whose (keyCols) bucket has ≤ cap members — a semi join
    * against the (tiny, aggregated) under-cap bucket list, so no window
    * shuffle-sort over the full banded set.
    */
  private[pipeline] def capBuckets(banded: DataFrame, keyCols: Seq[String], cap: Int): DataFrame = {
    val under = banded.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("graft_bn"))
      .filter(col("graft_bn") <= cap)
      .select(keyCols.map(col): _*)
    banded.join(under, keyCols, "left_semi")
  }

  /** Audit view of the band buckets the cap drops: one row per oversized
    * bucket with its cardinality (the "dropped mass"). Driver-sized output.
    */
  def oversizedBuckets(banded: DataFrame, keyCols: Seq[String]): DataFrame =
    banded.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > MaxBandBucket)

  /** Shared two-band signature-LSH candidate stage (q49 simhash, q54 SRP):
    * split an integer signature into low/high bands at `bandMod`, cap hot
    * buckets, self-join within band, Hamming-filter BEFORE anything wider
    * than (id, sig) shuffles, dedup. Returns (id_a, id_b, hamming); the
    * verify stage stays per-query.
    */
  private def signatureBandCandidates(
      sigs: DataFrame, // columns: id, sig
      bandMod: Long,
      maxHamming: Int): DataFrame = {
    val banded = capBuckets(
      sigs.select(col("id"), col("sig"),
        explode(array(
          struct(lit(0).as("band"), (col("sig") % bandMod).as("bval")),
          struct(lit(1).as("band"),
            floor(col("sig") / bandMod).cast("long").as("bval")))).as("bk"))
        .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.bval").as("bval")),
      Seq("band", "bval"), MaxBandBucket)
    val x = banded.as("x"); val y = banded.as("y")
    x.join(y,
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** LSH banding of a MinHash signature column: `(doc_id, sig)` →
    * `(doc_id, band, bandkey)` with [[BandRows]] hashes folded per band
    * (weights 1/31/961). Shared by q41's self-join and q90's
    * new-batch-vs-index join; the SQL twin is the `bands0` CTE.
    */
  private[pipeline] def minhashBands(docs: DataFrame): DataFrame = {
    val bandStructs = (0 until Family.size / BandRows).map { b =>
      val key = (0 until BandRows).map { r =>
        element_at(col("sig"), b * BandRows + r + 1) * lit(Seq(1L, 31L, 961L)(r))
      }.reduce(_ + _)
      struct(lit(b).as("band"), key.as("bandkey"))
    }
    docs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bandkey").as("bandkey"))
  }

  /** Corpus under test: documents plus perturbed near-duplicates (every 10th
    * doc re-appears with a 3-token tail), so the near-dup path has real
    * positives to find. Purely a derived view of the fixture.
    */
  private def corpus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    d.select(col("doc_id"), lower(col("text")).as("text"))
      .unionAll(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          lower(concat(col("text"), lit(" graft dup tail"))).as("text")))
  }

  private val CorpusSql =
    """corpus AS (
      |  SELECT doc_id, lower(text) AS text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, lower(text || ' graft dup tail')
      |  FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  private val ShinglesSql =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM toks,
       |  unnest(CASE WHEN len(t) >= 3
       |              THEN list_transform(range(1, len(t) - 1),
       |                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |              ELSE [] END) AS u(s)),
       |shh AS (SELECT doc_id, s, ${StrHashSql.format("s")} AS h FROM sh)""".stripMargin

  // ---- Q40 exact dedup ---------------------------------------------------

  /** Q40: exact dedup, keep-first by doc_id, keyed on md5 of normalized text
    * (small fixed-size shuffle key at 100 TB).
    */
  private def q40(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    d.groupBy(md5(lower(col("text"))).as("k"))
      .agg(min(struct(col("doc_id"), col("lang"), col("source"), col("n_chars"))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.source").as("source"), col("r.n_chars").as("n_chars"))
  }

  // ---- Q132 span-level exact-substring duplication ------------------------

  /** Q132: span-level exact-substring duplication audit (the dedup unit of
    * "Deduplicating Training Data Makes Language Models Better", Lee et
    * al., arXiv:2107.06499, re-expressed at word-shingle granularity):
    * inventory every distinct 8-word span corpus-wide and report, per
    * document, how many of its spans also appear VERBATIM in another
    * document. Doc-level dedup (q40/q41) misses partial copies — a page
    * quoting half of another page — which is exactly what span counts
    * surface; downstream policy (drop spans, drop docs over a duplicated
    * fraction) consumes this table.
    *
    * Scale shape: span extraction is one codegen row-level pass per doc
    * ([[TextOps.shingleHashesC]] — the distinct-span-hash set built
    * in-row, no explode+distinct shuffle); the corpus-wide inventory
    * groups 8-byte hash keys with map-side partial aggregation; the join
    * back is hash-partitioned on the same key, so a hot span (boilerplate
    * repeated in millions of docs) is AQE-skew-splittable. Nothing is
    * quadratic — total cost is O(total spans) over long keys.
    */
  private def q132(spark: SparkSession, sfDir: String): DataFrame = {
    val posts = corpus(spark, sfDir)
      .select(col("doc_id"),
        explode(TextOps.shingleHashesC(col("text"), 8)).as("h"))
    val inv = posts.groupBy(col("h")).agg(count(lit(1)).as("nd"))
    posts.join(inv, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
  }

  /** Oracle twin: same corpus, same 8-word spans, same hash domain (the
    * kernel dedups HASHES per doc, so the twin distincts on (doc_id, h)).
    * Docs with fewer than 8 tokens have no spans and drop out of both.
    */
  private val q132Sql =
    s"""WITH $CorpusSql,
       |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
       |sp AS (
       |  SELECT DISTINCT doc_id, s FROM toks,
       |  unnest(CASE WHEN len(t) >= 8
       |              THEN list_transform(range(1, len(t) - 6),
       |                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
       |                          t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
       |                          t[i+6] || ' ' || t[i+7])
       |              ELSE [] END) AS u(s)),
       |sph AS (SELECT DISTINCT doc_id, ${StrHashSql.format("s")} AS h FROM sp),
       |inv AS (SELECT h, count(*) AS nd FROM sph GROUP BY 1)
       |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |       CAST(sum(CASE WHEN i.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
       |FROM sph s JOIN inv i USING (h)
       |GROUP BY 1""".stripMargin

  // ---- Q133 token-budget shard packing ------------------------------------

  /** Q133: token-budget shard packing — the training-shard writer's
    * assignment: documents in a stable order (doc_id) are cut into shards
    * at a 4096-token budget; a doc lands in shard `cum_before div B`, so
    * shards are contiguous, deterministic, and a doc crossing the budget
    * boundary stays in the shard where it started (the streaming-writer
    * semantic). The output is the shard manifest (doc count, token total,
    * doc-id range per shard) a downstream loader consumes.
    *
    * Scale shape: a GLOBAL running sum without the global-window trap — a
    * naive `Window.orderBy(doc_id)` drags the whole corpus into one
    * reducer. Instead the classic two-level distributed prefix sum, fully
    * declarative: block-local sums (one map-side-combined aggregation,
    * corpus/1000 rows), block OFFSETS via a window over that tiny
    * aggregate (single-partition but planner-scale — block size is the
    * knob that keeps it so at any corpus), broadcast back, and the
    * intra-block cumsum as a window partitioned BY BLOCK. Every stage
    * bounded; no full-corpus sort into one partition at any size.
    */
  private def q133(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = 4096L
    val block = 1000L
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .withColumn("blk", expr(s"doc_id div $block"))
    val wOff = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy(col("blk")).agg(sum(col("tok")).as("bsum"))
      .withColumn("boff", coalesce(sum(col("bsum")).over(wOff), lit(0L)))
      .select(col("blk"), col("boff"))
    val wBlk = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(offsets), "blk")
      .withColumn("cum",
        col("boff") + coalesce(sum(col("tok")).over(wBlk), lit(0L)))
      .withColumn("shard", expr(s"cum div $budget"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** Oracle twin: the same cut points from one global window (the oracle
    * need not scale); `//` is DuckDB's integral division like Spark's
    * `div`.
    */
  private val q133Sql =
    """WITH d AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, tok,
      |         COALESCE(sum(tok) OVER (ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM d)
      |SELECT CAST(cum // 4096 AS BIGINT) AS shard,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(tok) AS BIGINT) AS tokens,
      |       CAST(min(doc_id) AS BIGINT) AS first_doc,
      |       CAST(max(doc_id) AS BIGINT) AS last_doc
      |FROM c GROUP BY 1""".stripMargin

  // ---- Q134 composite quality filter (the DECISION stage) -----------------

  /** Q134: the filter DECISION stage — q46 scores, this one decides.
    * Gopher-style ordered rejection rules (Rae et al. 2021 flavor:
    * length floor, symbol/alpha ratio, stop-word presence, repetition via
    * distinct-token ratio) evaluated with FIRST-FAILURE precedence so every
    * dropped doc carries one auditable reason — the shape a curation
    * pipeline reports ("N dropped for X") and replays after threshold
    * changes. All signals are row-level codegen (one pass, no shuffle,
    * no UDF); thresholds are fixture-calibrated (documented: real corpora
    * tune per-language; `low_alpha` never fires on the all-alpha fixture
    * and is kept as the stated rule order).
    */
  private def q134(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val t = split(lower(col("text")), " ")
    val nt = size(t).cast("long")
    val alpha = length(regexp_replace(lower(col("text")), "[^a-z ]", ""))
      .cast("double") / length(col("text"))
    val stopRatio = size(filter(t, x =>
      array_contains(array(lit("the"), lit("a"), lit("and"), lit("of")), x)))
      .cast("double") / nt
    val distinctRatio = size(array_distinct(t)).cast("double") / nt
    d.select(col("doc_id"),
      when(nt < 15, lit("too_short"))
        .when(alpha < 0.6, lit("low_alpha"))
        .when(stopRatio < 0.02, lit("low_stopwords"))
        .when(distinctRatio < 0.33, lit("repetitive"))
        .otherwise(lit("kept")).as("reason"))
  }

  private val q134Sql =
    """WITH d AS (SELECT doc_id,
      |  len(string_split(lower(text), ' ')) AS nt,
      |  CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
      |    / length(text) AS ar,
      |  CAST(len(list_filter(string_split(lower(text), ' '),
      |         x -> list_contains(['the', 'a', 'and', 'of'], x))) AS DOUBLE)
      |    / len(string_split(lower(text), ' ')) AS sr,
      |  CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
      |    / len(string_split(lower(text), ' ')) AS dr
      |FROM documents)
      |SELECT doc_id,
      |       CASE WHEN nt < 15 THEN 'too_short'
      |            WHEN ar < 0.6 THEN 'low_alpha'
      |            WHEN sr < 0.02 THEN 'low_stopwords'
      |            WHEN dr < 0.33 THEN 'repetitive'
      |            ELSE 'kept' END AS reason
      |FROM d""".stripMargin

  // ---- Q85 chunking / Q86 decontamination --------------------------------

  /** Q85: document chunking — the LLM-preprocessing step that turns each
    * document into overlapping token windows (64 tokens, stride 48) ready
    * for tokenization/embedding. Pure row-level explode: `sequence` over
    * chunk starts, `slice`+`array_join` per chunk, md5 as the stable chunk
    * key — no shuffle at all, the shape that streams through 100 TB.
    * Trailing windows shorter than the overlap are kept (deterministic,
    * mirrored by the oracle's `range(0, n, 48)`).
    */
  private def q85(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val t = split(lower(col("text")), " ")
    val starts = sequence(lit(0), greatest(size(col("t")) - 1, lit(0)), lit(48))
    d.select(col("doc_id"), t.as("t"))
      .select(col("doc_id"), col("t"), explode(starts).as("s"))
      .filter(col("s") < size(col("t"))) // the n=0 doc would emit start 0
      .select(col("doc_id"), col("s").cast("long").as("chunk_start"),
        array_join(slice(col("t"), col("s") + 1,
          least(lit(64), size(col("t")) - col("s"))), " ").as("chunk"))
      .select(col("doc_id"), col("chunk_start"),
        (size(split(col("chunk"), " "))).cast("long").as("chunk_tokens"),
        md5(col("chunk")).as("chunk_hash"))
  }

  private val q85Sql =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t
      |           FROM documents),
      |c AS (
      |  SELECT doc_id, CAST(s AS BIGINT) AS chunk_start,
      |         array_to_string(t[s + 1 : s + least(64, len(t) - s)], ' ') AS chunk
      |  FROM t, unnest(range(0, greatest(len(t), 1), 48)) AS u(s)
      |  WHERE s < len(t))
      |SELECT doc_id, chunk_start,
      |       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS chunk_tokens,
      |       md5(chunk) AS chunk_hash
      |FROM c""".stripMargin

  /** Q86: test-set decontamination — flag training docs whose shingle sets
    * are substantially CONTAINED in an evaluation document (every 97th doc
    * stands in for the benchmark set). Containment |train ∩ eval| / |train|
    * is the decontamination metric (Jaccard under-fires when the eval doc
    * is much longer). The eval side is tiny by construction, so it
    * broadcasts and the scan stays one embarrassingly-parallel pass with a
    * per-pair sorted-merge kernel — at 100 TB this is a map-only job, no
    * shuffle of the training corpus.
    */
  private def q86(spark: SparkSession, sfDir: String): DataFrame = {
    // train side = the perturbed corpus (its planted dup-tails of eval docs
    // ARE the contamination to catch); eval side = the plain benchmark
    // stand-in, every 97th base document
    val c = corpus(spark, sfDir)
      .select(col("doc_id"), TextOps.shingleHashesC(col("text"), 3).as("dh"))
      .filter(size(col("dh")) > 0)
    val evals = c.filter(col("doc_id") % 97 === 0 && col("doc_id") < 100000)
      .select(col("doc_id").as("eval_id"), col("dh").as("dhe"))
    c.filter(!(col("doc_id") % 97 === 0 && col("doc_id") < 100000))
      .crossJoin(broadcast(evals))
      .withColumn("n_common", TextOps.sortedCommonC(col("dh"), col("dhe")))
      .select(col("doc_id"), col("eval_id"), col("n_common"),
        (col("n_common").cast("double") / size(col("dh"))).as("containment"))
      .filter(col("containment") >= 0.5)
  }

  private val q86Sql =
    s"""WITH $CorpusSql,
       |$ShinglesSql,
       |dh86 AS (SELECT DISTINCT doc_id, h FROM shh),
       |sz86 AS (SELECT doc_id, count(*) AS n FROM dh86 GROUP BY 1),
       |pairs86 AS (
       |  SELECT tr.doc_id, ev.doc_id AS eval_id, count(*) AS n_common
       |  FROM dh86 tr JOIN dh86 ev ON ev.h = tr.h
       |   AND (ev.doc_id % 97 = 0 AND ev.doc_id < 100000)
       |   AND NOT (tr.doc_id % 97 = 0 AND tr.doc_id < 100000)
       |  GROUP BY 1, 2)
       |SELECT p.doc_id, p.eval_id, CAST(p.n_common AS BIGINT) AS n_common,
       |       CAST(p.n_common AS DOUBLE) / z.n AS containment
       |FROM pairs86 p JOIN sz86 z ON z.doc_id = p.doc_id
       |WHERE CAST(p.n_common AS DOUBLE) / z.n >= 0.5""".stripMargin

  // ---- Q139 boilerplate removal / Q140 bloom decontamination -------------

  /** Q139: boilerplate removal — CCNet-style line-level dedup (Wenzek et
    * al., "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data", arXiv:1911.00359 §3.1, also RefinedWeb's line-wise
    * filter), re-expressed at 8-token segment granularity because the
    * fixture corpus has no newlines: segment each document into
    * consecutive 8-token windows, count corpus-wide how many DISTINCT
    * documents contain each segment, mark segments appearing in ≥ 3 docs
    * as boilerplate, and rebuild every document from its surviving
    * segments in order (a fully-boilerplate document drops out entirely —
    * CCNet's behavior).
    *
    * Scale shape: the frequency pass shuffles only (segment, partial
    * count) pairs — map-side combine collapses within-partition repeats —
    * and the hot set flows back as a LEFT ANTI join that Catalyst
    * broadcasts while small and falls back to a shuffled anti join when a
    * 100 TB corpus's boilerplate set outgrows the threshold; reassembly is
    * the one corpus-wide shuffle (by doc_id). No driver materialization
    * anywhere.
    */
  private def q139(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val toks = split(lower(col("text")), " ")
    val starts = sequence(lit(0), greatest(size(col("t")) - 1, lit(0)), lit(8))
    val segs = d.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        (floor(greatest(size(col("t")) - 1, lit(0)) / 8) + 1)
          .cast("long").as("n_segs"),
        col("t"), explode(starts).as("s"))
      .filter(col("s") < size(col("t"))) // the n=0 doc would emit start 0
      .select(col("doc_id"), col("n_segs"), col("s").cast("long").as("s"),
        array_join(slice(col("t"), col("s") + 1,
          least(lit(8), size(col("t")) - col("s"))), " ").as("seg"))
    val hot = segs.select(col("seg"), col("doc_id")).distinct()
      .groupBy(col("seg")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 3)
      .select(col("seg"))
    segs.join(hot, Seq("seg"), "left_anti")
      .groupBy(col("doc_id"), col("n_segs"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("s"), col("seg")))),
          x => x.getField("seg")), " ")).as("clean_hash"))
      .select(col("doc_id"), col("n_segs"), col("n_kept"), col("clean_hash"))
  }

  private val q139Sql =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t
      |           FROM documents),
      |segs AS (
      |  SELECT doc_id,
      |         CAST(greatest(len(t) - 1, 0) // 8 + 1 AS BIGINT) AS n_segs,
      |         CAST(s AS BIGINT) AS s,
      |         array_to_string(t[s + 1 : s + least(8, len(t) - s)], ' ') AS seg
      |  FROM t, unnest(range(0, greatest(len(t), 1), 8)) AS u(s)
      |  WHERE s < len(t)),
      |hot AS (
      |  SELECT seg FROM (SELECT seg, count(DISTINCT doc_id) AS nd
      |                   FROM segs GROUP BY 1) WHERE nd >= 3)
      |SELECT doc_id, n_segs, CAST(count(*) AS BIGINT) AS n_kept,
      |       md5(string_agg(seg, ' ' ORDER BY s)) AS clean_hash
      |FROM segs WHERE seg NOT IN (SELECT seg FROM hot)
      |GROUP BY 1, 2""".stripMargin

  /** Q140: bloom-prefiltered decontamination — q86's contamination check
    * restructured the way a production pipeline actually runs it when the
    * benchmark suite is large: the eval side's shingle hashes are folded
    * into a Bloom filter (`org.apache.spark.util.sketch.BloomFilter` — a
    * 100M-n-gram benchmark set is ~120 MB of bloom vs gigabytes of hash
    * set), the TRAIN scan applies a map-only `exists(dh, might_contain)`
    * prefilter through Spark's own codegen'd `BloomFilterMightContain`
    * expression, and only the surviving candidates pay the exact
    * sorted-merge intersection against the broadcast eval frame. Bloom
    * false positives are killed by the exact verify and false negatives
    * are impossible, so the result is EXACT — the oracle is the plain
    * join, no bloom in sight. At 100 TB: zero shuffles of the corpus
    * (map-only prefilter + broadcast verify), the shape that makes
    * decontamination affordable at every ingest.
    */
  private def q140(spark: SparkSession, sfDir: String): DataFrame = {
    val c = corpus(spark, sfDir)
      .select(col("doc_id"), TextOps.shingleHashesC(col("text"), 3).as("dh"))
      .filter(size(col("dh")) > 0)
    val evals = c.filter(col("doc_id") % 97 === 0 && col("doc_id") < 100000)
      .select(col("doc_id").as("eval_id"), col("dh").as("dhe"))
    // benchmark n-grams are driver-small by nature (eval suites are KB-MB,
    // not TB) — the one collect, bounded by the benchmark not the corpus
    val evalHashes = evals.select(explode(col("dhe")).as("h")).distinct()
      .collect().map(_.getLong(0))
    val bloom = org.apache.spark.util.sketch.BloomFilter
      .create(math.max(evalHashes.length.toLong, 1L), 0.01)
    evalHashes.foreach(bloom.putLong)
    val baos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(baos)
    val bloomLit = lit(baos.toByteArray)
    def mightContain(h: Column): Column = ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(bloomLit), ColumnBridge.expression(h)))
    val train = c.filter(!(col("doc_id") % 97 === 0 && col("doc_id") < 100000))
    train
      .filter(exists(col("dh"), mightContain)) // map-only candidate gate
      .crossJoin(broadcast(evals))
      .withColumn("n_common", TextOps.sortedCommonC(col("dh"), col("dhe")))
      .filter(col("n_common") >= 1)
      .select(col("doc_id"), col("eval_id"),
        col("n_common").cast("long").as("n_common"))
  }

  private val q140Sql =
    s"""WITH $CorpusSql,
       |$ShinglesSql,
       |dh140 AS (SELECT DISTINCT doc_id, h FROM shh)
       |SELECT tr.doc_id, ev.doc_id AS eval_id, CAST(count(*) AS BIGINT) AS n_common
       |FROM dh140 tr JOIN dh140 ev ON ev.h = tr.h
       | AND (ev.doc_id % 97 = 0 AND ev.doc_id < 100000)
       | AND NOT (tr.doc_id % 97 = 0 AND tr.doc_id < 100000)
       |GROUP BY 1, 2""".stripMargin

  // ---- Q41 MinHash LSH near-dup -----------------------------------------

  private def q41(spark: SparkSession, sfDir: String): DataFrame = {
    // Row-level kernel shape: `minhashSigC` computes all 12 family
    // minhashes over each doc's DISTINCT shingles in one codegen'd pass,
    // and `shingleCountC` the distinct-shingle count — deleting the
    // explode → distinct → groupBy shuffle cascade of the grouped
    // formulation (which the oracle keeps, so the gate proves kernel/SQL
    // equivalence). A doc with <3 tokens has an empty signature and never
    // bands, exactly as it produces no rows when grouped. Shuffles left:
    // the capped band self-join and two keyed joins that fetch candidate
    // texts; `shingleCommonC` then verifies Jaccard per pair row-level.
    val docs = corpus(spark, sfDir)
      .select(col("doc_id"), col("text"),
        TextOps.minhashSigC(col("text"), 3).as("sig"),
        TextOps.shingleCountC(col("text"), 3).as("n"))
      .filter(size(col("sig")) > 0)
      // cached: one small row per doc, scanned by the band stage (twice,
      // via the bucket cap) and the two candidate-text joins — and the
      // whole q41 subplan re-runs under q53
      .cache()
    val bands = capBuckets(minhashBands(docs), Seq("band", "bandkey"), MaxBandBucket)
    val x = bands.as("x"); val y = bands.as("y")
    val cand = x.join(y,
        col("x.band") === col("y.band") && col("x.bandkey") === col("y.bandkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta"),
        col("n").as("na")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb"),
        col("n").as("nb")), "doc_b")
      .withColumn("n_common", TextOps.shingleCommonC(col("ta"), col("tb"), 3))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      // cached: the pair list is tiny relative to the corpus (that's its
      // nature) and is the natural handoff to the clustering stage — q53's
      // identical subplan hits this CacheManager entry instead of re-running
      // the whole candidate+verify pipeline
      .cache()
  }

  /** The q41 pipeline as a reusable CTE chain ending in `pairsq` (the
    * thresholded near-dup pairs) — shared by the q41 and q53 oracles.
    */
  private val NearDupCtes: String = {
    val famRows = Family.map { case (i, a, b) => s"($i, $a, $b)" }.mkString(", ")
    s"""$CorpusSql,
       |$ShinglesSql,
       |fam AS (SELECT * FROM (VALUES $famRows) f(i, a, b)),
       |mh AS (SELECT doc_id, i, min((a * h + b) % $MinhashP) AS mh
       |       FROM shh, fam GROUP BY 1, 2),
       |bands0 AS (
       |  SELECT doc_id, (i - 1) // $BandRows AS band,
       |         sum(mh * (CASE (i - 1) % $BandRows
       |                   WHEN 0 THEN 1 WHEN 1 THEN 31 ELSE 961 END)) AS bandkey
       |  FROM mh GROUP BY 1, 2),
       |bands AS (
       |  SELECT doc_id, band, bandkey FROM bands0
       |  QUALIFY count(*) OVER (PARTITION BY band, bandkey) <= $MaxBandBucket),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bandkey = y.bandkey AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY 1),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN shh sa ON sa.doc_id = c.doc_a
       |  JOIN shh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
       |  GROUP BY 1, 2),
       |pairsq AS (
       |  SELECT i.doc_a, i.doc_b, CAST(i.n_common AS BIGINT) AS n_common,
       |         CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
       |  FROM inter i
       |  JOIN sz za ON za.doc_id = i.doc_a
       |  JOIN sz zb ON zb.doc_id = i.doc_b
       |  WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= $JaccardThreshold)""".stripMargin
  }

  private val q41Sql: String =
    s"""WITH $NearDupCtes
       |SELECT doc_a, doc_b, n_common, jaccard FROM pairsq""".stripMargin

  /** Distributed connected components over an undirected pair list
    * (`doc_a`, `doc_b`) → labels (`doc_id`, `rep` = component minimum).
    *
    * Min-label propagation with pointer-jumping path compression: each
    * round first takes the min label across neighbors, then replaces every
    * label by its label's label (`rep := rep(rep)`). Propagation alone
    * converges in O(diameter) rounds; the jump step halves label-chain
    * depth each round, so convergence is O(log diameter) — a 1M-hop chain
    * (plausible in a 100 TB near-dup graph) resolves in ~20 rounds, not
    * 1M. Each round is two keyed joins + one aggregate with one counting
    * action; all data stays distributed.
    *
    * FAILS LOUDLY if the cap is hit before convergence — a silently
    * unconverged result would mislabel components with a green-looking
    * output (round-2 verdict finding).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // Eagerly pin the (tiny) pair list before fanning it out: `edges`
    // references `pairs` twice, and every loop round references `edges` —
    // if the upstream cache entry has been evicted (observed mid-bench
    // under memory pressure), an unpinned plan re-runs the entire q41
    // candidate+verify pipeline once per union branch. localCheckpoint
    // truncates lineage AND spills to disk instead of recomputing.
    val pinned = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val edges = pinned
      .union(pinned.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .cache()
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("rep", col("doc_id")).cache()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("rep")), "doc_b")
        .groupBy(col("doc_a").as("nid")).agg(min(col("rep")).as("nrep"))
      // carry the previous label through the update so convergence is
      // decided by ONE job per round (a separate compare join doubled the
      // per-iteration latency)
      val propagated = labels
        .join(neighborMin, labels("doc_id") === neighborMin("nid"), "left_outer")
        .select(col("doc_id"), col("rep").as("prev"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
        .cache()
      // pointer jump: rep := rep(rep). Every rep value is itself a node id
      // (labels are node ids and propagation only moves mins between
      // nodes), so the lookup join always hits; left_outer + coalesce is
      // belt-and-braces against an isolated self-labelled node.
      val lookup = propagated.select(col("doc_id").as("rep"), col("rep").as("jrep"))
      // localCheckpoint truncates the logical-plan lineage each round: the
      // self-join above references the previous round TWICE, so without
      // truncation the plan tree doubles per round (exponential — blew the
      // heap in plan stringification before any data was large).
      val updated = propagated
        .join(lookup, Seq("rep"), "left_outer")
        .select(col("doc_id"), col("prev"),
          coalesce(col("jrep"), col("rep")).as("rep"))
        .localCheckpoint(true)
      changed = updated.filter(col("rep") =!= col("prev")).count()
      labels.unpersist()
      propagated.unpersist()
      labels = updated.select(col("doc_id"), col("rep"))
      iter += 1
    }
    edges.unpersist()
    require(changed == 0,
      s"connected-components failed to converge within $maxIter rounds " +
        "(component label-chain deeper than 2^rounds — raise maxIter)")
    labels
  }

  /** Q53: dedup clusters — connected components over the near-dup pair
    * graph (the step after candidate generation in a real dedup pipeline:
    * groups of mutually-similar docs collapse to one representative).
    */
  private def q53(spark: SparkSession, sfDir: String): DataFrame =
    connectedComponents(q41(spark, sfDir).select(col("doc_a"), col("doc_b")))

  private val q53Sql =
    s"""WITH RECURSIVE $NearDupCtes,
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairsq
       |  UNION
       |  SELECT doc_b, doc_a FROM pairsq),
       |reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS doc_id, least(a, min(b)) AS rep
       |FROM reach GROUP BY a""".stripMargin

  // ---- Q42 cosine top-k / Q44 IVF ---------------------------------------

  /** Sequential-fold dot product — the codegen'd [[graft.functions.VectorOps.dotFold]]
    * kernel, bit-identical to the previous `aggregate(zip_with(...))`
    * higher-order formulation (same element order and rounding) and to the
    * oracles' `list_sum(list_transform(...))`.
    */
  private def dotD(a: Column, b: Column): Column =
    graft.functions.VectorOps.dotC(a, b)

  private def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Q42: brute-force cosine top-5 for a broadcast query set. Norms are
    * computed once per vector (one narrow pass), not once per pair. The
    * ranking is the bounded [[graft.functions.TopKByScore]] aggregate, not
    * a `row_number()` window: the window shape repartitions EVERY scored
    * row into |queries| reducers, while the aggregate's map-side partial
    * keeps ≤5 rows per (scan partition, query), so the one exchange
    * carries O(k × partitions × queries) rows no matter the corpus size.
    * Ranks are positional over the best-first array (same total order —
    * cos DESC, vec_id ASC — the window used; oracle unchanged).
    */
  private def q42(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qnrm"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (dotD(col("qe"), col("embedding")) / (col("nrm") * col("qnrm"))).as("cos"))
    scored.groupBy(col("qid"))
      .agg(graft.functions.TopKByScore.topK(
        col("cos"), col("vec_id").cast("long"), 5).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("qid"), col("t.id").as("vec_id"),
        (col("pos") + 1).cast("long").as("rn"), col("t.score").as("cos"))
  }

  private val q42Sql =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
      |p AS (
      |  SELECT q.qid, e.vec_id,
      |         list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * q.qv[i]))
      |           / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
      |              * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos
      |  FROM e, q WHERE e.vec_id <> q.qid)
      |SELECT qid, vec_id, CAST(rn AS BIGINT) AS rn, cos FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      |  FROM p) t
      |WHERE rn <= 5""".stripMargin

  /** One-pass IVF centroid assignment, shared by Q44 and Q51 (identical
    * plan → one CacheManager entry even across both queries): every vector
    * joins the 4 broadcast centroid seeds and keeps its best bucket.
    */
  private def ivfAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
    val cents = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"),
        (dotD(col("cv"), col("embedding")) / (col("nrm") * col("cnrm"))).as("ccos"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"))
      .cache()
  }

  /** Q44: IVF-style ANN — every vector is assigned to its nearest of 4
    * centroid seeds (one pass, broadcast centroids); each query then probes
    * only its own centroid bucket. This is the shape that scales: candidate
    * sets shrink by the bucket factor and nothing is all-pairs.
    */
  private def q44(spark: SparkSession, sfDir: String): DataFrame = {
    val assign = ivfAssign(spark, sfDir)
    val qs = assign.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qnrm"), col("cid"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    qs.join(assign, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cid"),
        (dotD(col("qe"), col("embedding")) / (col("nrm") * col("qnrm"))).as("cos"))
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter(col("rn") <= 3)
  }

  /** Oracle twin of [[ivfAssign]], shared by the Q44 and Q51 oracles. */
  private val IvfAssignCte =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
      |assign AS (
      |  SELECT vec_id, v, cid FROM (
      |    SELECT e.vec_id, e.v, c.cid,
      |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * c.cv[i]))
      |               / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
      |                  * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) DESC,
      |             c.cid) AS arn
      |    FROM e, c) t
      |  WHERE arn = 1)""".stripMargin

  private val q44Sql =
    s"""WITH $IvfAssignCte,
      |q AS (SELECT vec_id AS qid, v AS qv, cid FROM assign WHERE vec_id % 50 = 0),
      |p AS (
      |  SELECT q.qid, a.vec_id, a.cid,
      |         list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * q.qv[i]))
      |           / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
      |              * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos
      |  FROM q JOIN assign a ON a.cid = q.cid AND a.vec_id <> q.qid)
      |SELECT qid, vec_id, cid, cos, CAST(rn AS BIGINT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      |  FROM p) t
      |WHERE rn <= 3""".stripMargin

  /** Q78: IVF ANN with nprobe=2 — the standard recall lever: a query whose
    * true neighbors straddle a centroid boundary misses them under Q44's
    * own-bucket probe; probing the two nearest centroid buckets recovers
    * most of that recall for 2× the candidate work (still nothing close to
    * all-pairs). Buckets are disjoint (each vector has ONE assignment), so
    * the probe union needs no dedup.
    */
  private def q78(spark: SparkSession, sfDir: String): DataFrame = {
    val assign = ivfAssign(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
    val cents = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("nrm").as("cnrm"))
    val qs = assign.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qnrm"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    val probes = qs.crossJoin(broadcast(cents))
      .select(col("qid"), col("qe"), col("qnrm"), col("cid"),
        (dotD(col("cv"), col("qe")) / (col("qnrm") * col("cnrm"))).as("qcos"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= 2)
      .select(col("qid"), col("qe"), col("qnrm"), col("cid"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    probes.join(assign, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cid"),
        (dotD(col("qe"), col("embedding")) / (col("nrm") * col("qnrm"))).as("cos"))
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter(col("rn") <= 3)
  }

  private val q78Sql =
    s"""WITH $IvfAssignCte,
      |q0 AS (SELECT vec_id AS qid, v AS qv FROM assign WHERE vec_id % 50 = 0),
      |probes AS (
      |  SELECT qid, qv, cid FROM (
      |    SELECT q0.qid, q0.qv, c.cid,
      |           row_number() OVER (PARTITION BY q0.qid ORDER BY
      |             list_sum(list_transform(range(1, len(q0.qv) + 1), i -> q0.qv[i] * c.cv[i]))
      |               / (sqrt(list_sum(list_transform(q0.qv, x -> x * x)))
      |                  * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) DESC,
      |             c.cid) AS prn
      |    FROM q0, c) t
      |  WHERE prn <= 2),
      |p AS (
      |  SELECT pr.qid, a.vec_id, a.cid,
      |         list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * pr.qv[i]))
      |           / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
      |              * sqrt(list_sum(list_transform(pr.qv, x -> x * x)))) AS cos
      |  FROM probes pr JOIN assign a ON a.cid = pr.cid AND a.vec_id <> pr.qid)
      |SELECT qid, vec_id, cid, cos, CAST(rn AS BIGINT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      |  FROM p) t
      |WHERE rn <= 3""".stripMargin

  // ---- Q81 exact n-gram Jaccard self-join (prefix filtering) -------------

  /** Q81: EXACT n-gram (3-shingle) Jaccard near-dup join via prefix
    * filtering (the PPJoin family) — the deterministic counterpart to q41's
    * MinHash LSH: output is provably ALL pairs with Jaccard ≥ t (= 0.6,
    * [[JaccardThreshold]]), no probabilistic recall loss.
    *
    * Shape: build the shingle inverted index, rank each doc's shingles
    * rarest-first (global document frequency, ties by shingle text — a
    * total order, so both engines pick identical prefixes), and index only
    * each doc's first `n - ceil(t·n) + 1` shingles. Any pair with Jaccard
    * ≥ t MUST collide inside these prefixes (pigeonhole on the ≥ ceil(t·n)
    * shared shingles), so the candidate join touches only rare-shingle
    * posting lists — the quadratic work concentrates where df is small. A
    * size filter (`3·max(na,nb) ≤ 5·min(na,nb)`, exact integer form of
    * min/max ≥ 3/5) prunes cross-size pairs the Jaccard bound already
    * excludes. Survivors get one row-level exact-intersection kernel pass.
    *
    * Prefix length and size filter use INTEGER arithmetic (`ceil(0.6·n)` =
    * `(3n+4) div 5`): the double form `floor((1-0.6)*n)` is off by one at
    * multiples of 5 (binary 0.6 is not exact), which would silently drop
    * boundary true pairs. The double final threshold (0.6d, a hair BELOW
    * 3/5) is looser than both integer pre-filters only by < 2.3e-17 — no
    * integral size ratio can fall in that gap, so the pre-filters prune
    * nothing the final filter keeps.
    *
    * Scale: df ranking is one agg + one window over the posting table;
    * candidates shuffle on shingle; at 100 TB the standard extra lever is
    * length-bucketed repartition, which composes with this plan unchanged.
    */
  private def q81(spark: SparkSession, sfDir: String): DataFrame = {
    // The whole join runs in the HASH domain: one kernel pass per doc
    // emits its sorted distinct shingle-hash set, so df ranking, the
    // prefix self-join, and the verify compare longs, never shingle
    // strings — and the verify is a merge scan over two sorted arrays
    // instead of a per-pair hash-set build (measured ~5× on the verify
    // stage). The oracle mirrors the hash domain via `shh`, so even hash
    // collisions (which would merge two shingles) are engine-identical.
    val docs = corpus(spark, sfDir)
      .select(col("doc_id"), TextOps.shingleHashesC(col("text"), 3).as("dh"))
      .filter(size(col("dh")) > 0)
      .select(col("doc_id"), col("dh"), size(col("dh")).cast("long").as("n"))
      .cache() // scanned by the postings build and both verify-side joins
    val postings = docs.select(col("doc_id"), col("n"), explode(col("dh")).as("h"))
    val dfreq = postings.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val wPref = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val pref = postings.join(dfreq, "h")
      .withColumn("rn", row_number().over(wPref))
      .filter(col("rn") <= col("n") - expr("(n * 3 + 4) div 5") + 1)
      .select(col("doc_id"), col("n"), col("h"))
    val a = pref.as("a"); val b = pref.as("b")
    val cand = a.join(b,
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * 3 <= col("a.n") * 5 && col("a.n") * 3 <= col("b.n") * 5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("dh").as("dha"),
        col("n").as("na")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("dh").as("dhb"),
        col("n").as("nb")), "doc_b")
      .withColumn("n_common", TextOps.sortedCommonC(col("dha"), col("dhb")))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  /** Oracle twin: same prefix-filter candidates (integer prefix length,
    * same (df, s) tie-break), same exact verify. The size filter is omitted
    * — it only prunes candidates the final Jaccard filter rejects anyway,
    * so the output set is identical.
    */
  private val q81Sql =
    s"""WITH $CorpusSql,
       |$ShinglesSql,
       |dh AS (SELECT DISTINCT doc_id, h FROM shh),
       |dfreq AS (SELECT h, count(*) AS df FROM dh GROUP BY 1),
       |sz AS (SELECT doc_id, count(*) AS n FROM dh GROUP BY 1),
       |ranked AS (
       |  SELECT dh.doc_id, dh.h, sz.n,
       |         row_number() OVER (PARTITION BY dh.doc_id ORDER BY d.df, dh.h) AS rn
       |  FROM dh JOIN dfreq d USING (h) JOIN sz USING (doc_id)),
       |pref AS (SELECT doc_id, h FROM ranked WHERE rn <= n - (n * 3 + 4) // 5 + 1),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM pref a JOIN pref b ON a.h = b.h AND a.doc_id < b.doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN dh sa ON sa.doc_id = c.doc_a
       |  JOIN dh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
       |  GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b, CAST(i.n_common AS BIGINT) AS n_common,
       |       CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
       |FROM inter i
       |JOIN sz za ON za.doc_id = i.doc_a
       |JOIN sz zb ON zb.doc_id = i.doc_b
       |WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common)
       |        >= $JaccardThreshold""".stripMargin

  // ---- Q43 text stats / Q45 lang-id / Q46 quality / Q47 fingerprint ------

  private def q43(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val t = split(col("text"), " ")
    d.select(col("lang"), col("n_chars"), size(t).as("nt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("nt")).as("sum_tokens"),
        (sum(col("nt")).cast("double") / count(lit(1))).as("avg_tokens"))
  }

  private val q43Sql =
    """SELECT lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       min(n_chars) AS min_chars,
      |       max(n_chars) AS max_chars,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
      |       CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avg_tokens
      |FROM documents
      |GROUP BY 1""".stripMargin

  private val LangMarkers = Seq(
    "en" -> Seq("the", "a", "and"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "das"))

  /** Q45: marker-token language-ID heuristic (distinct-token overlap with
    * per-language stopword lists; argmax with fixed tie order en>es>de).
    */
  private def q45(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val dt = array_distinct(split(lower(col("text")), " "))
    val counts = LangMarkers.map { case (l, ms) =>
      val markers = array(ms.map(lit): _*)
      l -> size(filter(dt, t => array_contains(markers, t))).cast("long")
    }.toMap
    val pred = when(counts("en") >= counts("es") && counts("en") >= counts("de"), "en")
      .when(counts("es") >= counts("de"), "es").otherwise("de")
    d.select(col("doc_id"), col("lang"),
      counts("en").as("n_en"), counts("es").as("n_es"), counts("de").as("n_de"),
      pred.as("pred"))
  }

  private val q45Sql = {
    def cnt(ms: Seq[String]) = {
      val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
      s"len(list_filter(list_distinct(string_split(lower(text), ' ')), x -> list_contains($lst, x)))"
    }
    val (en, es, de) =
      (cnt(LangMarkers(0)._2), cnt(LangMarkers(1)._2), cnt(LangMarkers(2)._2))
    s"""SELECT doc_id, lang,
       |       $en AS n_en, $es AS n_es, $de AS n_de,
       |       CASE WHEN $en >= $es AND $en >= $de THEN 'en'
       |            WHEN $es >= $de THEN 'es' ELSE 'de' END AS pred
       |FROM documents""".stripMargin
  }

  /** Q46: heuristic quality scoring — alphabetic ratio, length score,
    * stopword ratio, combined score. Pure deterministic double arithmetic
    * with the same expression shape on both engines.
    */
  private def q46(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val t = split(lower(col("text")), " ")
    val nt = size(t).cast("long")
    val alpha = length(regexp_replace(lower(col("text")), "[^a-z ]", "")).cast("double") /
      length(col("text"))
    val stopRatio = size(filter(t, x =>
      array_contains(array(lit("the"), lit("a"), lit("and"), lit("of")), x)))
      .cast("double") / nt
    val lenScore = least(lit(1.0), nt.cast("double") / 100.0)
    d.select(col("doc_id"), nt.as("n_tokens"),
      alpha.as("alpha_ratio"), stopRatio.as("stop_ratio"), lenScore.as("len_score"),
      (alpha * 0.4 + lenScore * 0.3 + stopRatio * 0.3).as("quality"))
  }

  private val q46Sql =
    """SELECT doc_id,
      |       CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
      |       CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
      |         / length(text) AS alpha_ratio,
      |       CAST(len(list_filter(string_split(lower(text), ' '),
      |                x -> list_contains(['the', 'a', 'and', 'of'], x))) AS DOUBLE)
      |         / len(string_split(lower(text), ' ')) AS stop_ratio,
      |       least(1.0, CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 100.0) AS len_score,
      |       CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
      |           / length(text) * 0.4
      |         + least(1.0, CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 100.0) * 0.3
      |         + CAST(len(list_filter(string_split(lower(text), ' '),
      |                  x -> list_contains(['the', 'a', 'and', 'of'], x))) AS DOUBLE)
      |             / len(string_split(lower(text), ' ')) * 0.3 AS quality
      |FROM documents""".stripMargin

  /** Q47: document fingerprint — ordered polynomial fold over portable token
    * hashes (rolling-hash style), plus a regex token count.
    */
  private def q47(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val fp = TextOps.fingerprintC(lower(col("text")))
    d.select(col("doc_id"), fp.as("fingerprint"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .cast("long").as("n_re_tokens"))
  }

  private val q47Sql =
    s"""SELECT doc_id,
       |       list_reduce(
       |         list_concat([CAST(0 AS BIGINT)],
       |           list_transform(string_split(lower(text), ' '),
       |                          x -> ${StrHashSql.format("x")})),
       |         (a, b) -> (a * 131 + b) % 1000000007) AS fingerprint,
       |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_re_tokens
       |FROM documents""".stripMargin

  /** Q48: 16-bit SimHash over distinct token hashes (sign-sum per bit). */
  private def q48(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    d.select(col("doc_id"), TextOps.simhash16C(lower(col("text"))).as("simhash"))
  }

  private val q48Sql = {
    val th = StrHashSql.format("x")
    val bits = (0 until 16).map { j =>
      s"""CASE WHEN list_sum(list_transform(list_distinct(string_split(lower(text), ' ')),
         |  x -> CASE WHEN ($th >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |  THEN ${1L << j} ELSE 0 END""".stripMargin
    }.mkString("\n + ")
    s"""SELECT doc_id, CAST($bits AS BIGINT) AS simhash
       |FROM documents""".stripMargin
  }

  /** Q50: multimodal binary-column plumbing — documents' text re-materialized
    * as an opaque binary payload with a typed metadata struct, ranged hex
    * access (the "frame sample"), and a deterministic feature-extraction
    * kernel standing in for media decode (see
    * [[graft.functions.TextOps.binaryChecksum]]). The oracle mirrors the
    * byte math over character codes, valid because the corpus is ASCII
    * (verified: octet_length == length for every doc).
    */
  private def q50(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val payload = col("text").cast("binary")
    val meta = struct(lit("text/plain").as("mime"),
      length(payload).cast("long").as("n_bytes"))
    d.select(col("doc_id"), payload.as("payload"), meta.as("meta"))
      .select(col("doc_id"),
        col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"),
        lower(substring(hex(col("payload")), 1, 16)).as("head_hex"),
        lower(substring(hex(col("payload")), 33, 8)).as("mid_hex"),
        TextOps.binaryChecksumC(col("payload")).as("checksum"))
  }

  private val q50Sql =
    """SELECT doc_id,
      |       'text/plain' AS mime,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       lower(substr(hex(encode(text)), 1, 16)) AS head_hex,
      |       lower(substr(hex(encode(text)), 33, 8)) AS mid_hex,
      |       CAST(list_sum(list_transform(range(1, length(text) + 1),
      |              i -> CAST(ascii(substr(text, i, 1)) AS BIGINT) * ((i % 7) + 1)))
      |            % 1000000007 AS BIGINT) AS checksum
      |FROM documents""".stripMargin

  /** Q49: SimHash near-dup — the standard two-stage shape: signatures banded
    * into two 16-bit halves propose candidates (a pair within Hamming distance <
    * #bands is guaranteed to share a band), then an EXACT token-set Jaccard
    * verify confirms (Hamming ≤ 3 AND Jaccard ≥ 0.8). The verify stage is
    * what keeps the operator selective on low-entropy corpora (this
    * fixture's vocabulary is 33 words, so raw short signatures collide
    * heavily — exactly why production simhash dedup always verifies).
    * Runs over the perturbed corpus so planted near-dups exist; no
    * all-pairs join anywhere.
    */
  private def q49(spark: SparkSession, sfDir: String): DataFrame = {
    // token sets ride as SORTED HASH arrays (1-gram shingle hashes), so the
    // per-pair verify is a sorted-merge long scan instead of a string-set
    // intersect — same hash-domain pattern as q81, mirrored by the oracle
    val sigs = corpus(spark, sfDir)
      .select(col("doc_id"), TextOps.simhash32C(col("text")).as("sh"),
        TextOps.shingleHashesC(col("text"), 1).as("dt"))
      .cache()
    // Stage 1: banded candidates carry only (doc_id, sh) — the Hamming
    // filter runs before any token arrays are shuffled or compared. 16-bit
    // bands of the 32-bit signature: 8-bit bands measured ~90% of all pairs
    // as candidates on this low-entropy corpus.
    val cand = signatureBandCandidates(
      sigs.select(col("doc_id").as("id"), col("sh").as("sig")),
      bandMod = 65536L, maxHamming = 3)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
    // Stage 2: exact token-set Jaccard verify, only for Hamming survivors.
    val inter = TextOps.sortedCommonC(col("dta"), col("dtb"))
    val jac = inter.cast("double") / (size(col("dta")) + size(col("dtb")) - inter)
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("dt").as("dta")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("dt").as("dtb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming"), jac.as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  private val q49Sql =
    s"""WITH $CorpusSql,
       |sigs AS (
       |  SELECT doc_id,
       |         CAST(${(0 until 32).map { j =>
              s"""(CASE WHEN list_sum(list_transform(list_distinct(string_split(text, ' ')),
                 |  x -> CASE WHEN (${StrHashSql.format("x")} >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                 |  THEN ${1L << j} ELSE 0 END)""".stripMargin
            }.mkString("\n + ")} AS BIGINT) AS sh,
       |         list_distinct(list_transform(string_split(text, ' '),
       |           x -> ${StrHashSql.format("x")})) AS dt
       |  FROM corpus),
       |banded0 AS (
       |  SELECT doc_id, sh, 0 AS band, sh % 65536 AS bval FROM sigs
       |  UNION ALL
       |  SELECT doc_id, sh, 1 AS band, sh // 65536 AS bval FROM sigs),
       |banded AS (
       |  SELECT doc_id, sh, band, bval FROM banded0
       |  QUALIFY count(*) OVER (PARTITION BY band, bval) <= $MaxBandBucket),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |         CAST(bit_count(xor(x.sh, y.sh)) AS BIGINT) AS hamming
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id
       |  WHERE bit_count(xor(x.sh, y.sh)) <= 3)
       |SELECT c.doc_a, c.doc_b, c.hamming,
       |       CAST(len(list_filter(a.dt, t -> list_contains(b.dt, t))) AS DOUBLE)
       |         / (len(a.dt) + len(b.dt) - len(list_filter(a.dt, t -> list_contains(b.dt, t)))) AS jaccard
       |FROM cand c
       |JOIN sigs a ON a.doc_id = c.doc_a
       |JOIN sigs b ON b.doc_id = c.doc_b
       |WHERE CAST(len(list_filter(a.dt, t -> list_contains(b.dt, t))) AS DOUBLE)
       |        / (len(a.dt) + len(b.dt) - len(list_filter(a.dt, t -> list_contains(b.dt, t)))) >= 0.8""".stripMargin

  /** Q51: embedding-cosine near-dup restricted to IVF buckets (reuses the
    * Q44 centroid assignment) — the bucketed shape that avoids the O(n²)
    * cross join at scale; recall is the standard IVF trade, mirrored
    * exactly by the oracle.
    */
  private def q51(spark: SparkSession, sfDir: String): DataFrame = {
    val assign = ivfAssign(spark, sfDir)
    val a = assign.as("a"); val b = assign.as("b")
    a.join(b, col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dotD(col("a.embedding"), col("b.embedding")) /
          (col("b.nrm") * col("a.nrm"))).as("cos"))
      .filter(col("cos") >= 0.40)
  }

  private val q51Sql =
    s"""WITH $IvfAssignCte
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |       list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
      |         / (sqrt(list_sum(list_transform(b.v, x -> x * x)))
      |            * sqrt(list_sum(list_transform(a.v, x -> x * x)))) AS cos
      |FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
      |        / (sqrt(list_sum(list_transform(b.v, x -> x * x)))
      |           * sqrt(list_sum(list_transform(a.v, x -> x * x)))) >= 0.40""".stripMargin

  /** Q118: SEMANTIC dedup (SemDeDup, Abbas et al. 2023 — the
    * embedding-space counterpart of the q41 text tier): cluster the corpus
    * (shared cached IVF assignment), then WITHIN each cluster drop every
    * vector that has a smaller-id neighbor at cosine ≥ t — a deterministic
    * keep-one-representative rule. The quadratic work is bounded by the
    * CLUSTER size, never the corpus (k grows with the corpus; the q93
    * Lloyd step is the maintenance path), and the pair probe is the same
    * hash semi join on cid that q51 uses. Threshold 0.35 is calibrated to
    * the synthetic fixture (random 64-d embeddings, max off-diagonal
    * cosine ≈ 0.48 — real corpora use ~0.95+). Output: per-cluster member/
    * dropped counts plus the dropped-id checksum pinning the exact set.
    */
  private def q118(spark: SparkSession, sfDir: String): DataFrame = {
    val assign = ivfAssign(spark, sfDir)
    val a = assign.as("a"); val b = assign.as("b")
    val dropped = a.join(b,
      col("a.cid") === col("b.cid") && col("b.vec_id") < col("a.vec_id") &&
        (dotD(col("a.embedding"), col("b.embedding")) /
          (col("b.nrm") * col("a.nrm")) >= 0.35),
      "left_semi")
      .select(col("a.cid").as("cid"), col("a.vec_id").as("vec_id"))
    val members = assign.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"))
    val drops = dropped.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_dropped"), sum(col("vec_id")).as("drop_id_sum"))
    members.join(drops, Seq("cid"), "left_outer")
      .select(col("cid"), col("n_members"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("drop_id_sum"), lit(0L)).as("drop_id_sum"))
  }

  private val q118Sql =
    s"""WITH $IvfAssignCte,
      |d AS (
      |  SELECT DISTINCT a.cid, a.vec_id
      |  FROM assign a JOIN assign b
      |    ON b.cid = a.cid AND b.vec_id < a.vec_id
      |   AND list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
      |         / (sqrt(list_sum(list_transform(b.v, x -> x * x)))
      |            * sqrt(list_sum(list_transform(a.v, x -> x * x)))) >= 0.35),
      |m AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_members FROM assign GROUP BY 1),
      |dc AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_dropped,
      |              CAST(sum(vec_id) AS BIGINT) AS drop_id_sum
      |       FROM d GROUP BY 1)
      |SELECT m.cid, m.n_members,
      |       coalesce(dc.n_dropped, 0) AS n_dropped,
      |       coalesce(dc.drop_id_sum, 0) AS drop_id_sum
      |FROM m LEFT JOIN dc ON dc.cid = m.cid""".stripMargin

  /** Q52: PII/noise scrubbing — the training-data cleaning pass: count and
    * strip emails, URLs, and digit runs. Every 5th doc gets a planted noisy
    * suffix (derived view; the fixture corpus itself is clean) so the
    * scrubber has real matches. Patterns are restricted to the
    * Java-regex ∩ RE2 common subset, identical in both engines.
    */
  private def q52(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val noisy = when(col("doc_id") % 5 === 0,
      concat(col("text"),
        lit(" reach test.user@example.com or http://graft.example/data ref 4711")))
      .otherwise(col("text"))
    val EmailRe = "[a-z0-9.]+@[a-z0-9.]+"
    val UrlRe = "https?://[^ ]+"
    val NumRe = "[0-9]+"
    val cleaned = regexp_replace(regexp_replace(regexp_replace(
      noisy, EmailRe, ""), UrlRe, ""), NumRe, "")
    d.select(col("doc_id"),
      regexp_count(noisy, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(noisy, lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(noisy, lit(NumRe)).cast("long").as("n_nums"),
      length(cleaned).cast("long").as("len_clean"))
  }

  private val q52Sql =
    """SELECT doc_id,
      |       CAST(len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
      |       CAST(len(regexp_extract_all(t, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
      |       CAST(len(regexp_extract_all(t, '[0-9]+')) AS BIGINT) AS n_nums,
      |       CAST(length(regexp_replace(regexp_replace(regexp_replace(
      |         t, '[a-z0-9.]+@[a-z0-9.]+', '', 'g'), 'https?://[^ ]+', '', 'g'),
      |         '[0-9]+', '', 'g')) AS BIGINT) AS len_clean
      |FROM (SELECT doc_id,
      |        CASE WHEN doc_id % 5 = 0
      |             THEN text || ' reach test.user@example.com or http://graft.example/data ref 4711'
      |             ELSE text END AS t
      |      FROM documents) d""".stripMargin

  // ---- Q58 BPE-ish tokenizer / Q59 frame sampling ------------------------

  /** BPE-ish pre-tokenizer pattern: alpha runs, digit runs, or single
    * non-alphanumeric marks — the GPT-2-style split shape, restricted to the
    * Java-regex ∩ RE2 common subset so both engines tokenize identically.
    */
  private val BpeTokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Q58: token counting with a BPE-ish regex tokenizer — the budget pass a
    * training-data pipeline runs before packing: token counts, vocabulary
    * size, alpha-token share, and covered characters per document. One
    * narrow row-level pass (regex tokenize once, then pure array math);
    * embarrassingly parallel at 100 TB.
    */
  private def q58(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    d.select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit(BpeTokenRe), lit(0)).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_unique"),
        expr("size(filter(toks, t -> t rlike '^[a-z]+$'))").cast("long").as("n_alpha"),
        expr("aggregate(toks, 0L, (a, t) -> a + length(t))").as("chars_covered"))
  }

  private val q58Sql =
    s"""SELECT doc_id,
       |       CAST(len(toks) AS BIGINT) AS n_tokens,
       |       CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
       |       CAST(len(list_filter(toks, t -> regexp_full_match(t, '[a-z]+'))) AS BIGINT)
       |         AS n_alpha,
       |       CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT)
       |         AS chars_covered
       |FROM (SELECT doc_id, regexp_extract_all(lower(text), '$BpeTokenRe') AS toks
       |      FROM documents) t""".stripMargin

  /** Q59: multimodal frame sampling — the `mapInPandas`-shaped media path
    * expressed Spark-native: the opaque binary payload (q50's plumbing) is
    * split into 256-byte "frames", every 2nd frame is sampled, and each
    * sampled frame yields a 32-byte prefix plus a deterministic
    * feature-extraction checksum (the codegen'd stand-in for a media
    * decoder — the real decode would slot into the same per-frame kernel).
    * Explode + row-level kernels: no shuffle at all until a consumer
    * aggregates. The oracle mirrors the byte math over character codes,
    * valid because the corpus is ASCII (octet_length == length, verified in
    * q50).
    */
  private def q59(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    d.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"), col("payload"),
        explode(expr("sequence(0L, cast((length(payload) - 1) div 256 as bigint))"))
          .as("frame_idx"))
      .filter(col("frame_idx") % 2 === 0)
      .select(col("doc_id"), col("frame_idx"),
        expr("substr(payload, cast(frame_idx * 256 + 1 as int), 32)").as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        lower(hex(col("frame"))).as("frame_hex"),
        TextOps.binaryChecksumC(col("frame")).as("checksum"))
  }

  private val q59Sql =
    """WITH f AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, (length(text) + 255) // 256)) AS frame_idx
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |         substr(text, CAST(frame_idx * 256 + 1 AS INTEGER), 32) AS frame
      |  FROM f WHERE frame_idx % 2 = 0)
      |SELECT doc_id, frame_idx,
      |       CAST(length(frame) AS BIGINT) AS frame_bytes,
      |       lower(hex(encode(frame))) AS frame_hex,
      |       CAST(list_sum(list_transform(range(1, length(frame) + 1),
      |              i -> CAST(ascii(substr(frame, i, 1)) AS BIGINT) * ((i % 7) + 1)))
      |            % 1000000007 AS BIGINT) AS checksum
      |FROM s""".stripMargin

  // ---- Q54 SRP-LSH / Q55 stratified sample / Q56 length packing ----------

  /** Fixed pseudo-random ±1 hyperplane entries for signed random projection
    * (defined in [[graft.functions.VectorOps.srpSign]]), shared verbatim
    * with the oracle (both sides read the same literals, so no cross-engine
    * hash function is needed). 16 planes × 64 dims.
    */
  private val SrpBits = 16
  private val SrpDim = 64
  private def srpSign(j: Int, i: Int): Int =
    graft.functions.VectorOps.srpSign(j, i)

  /** Q54: embedding near-dup via signed-random-projection LSH — the third
    * ANN path beside brute-force (q42) and IVF (q44/q51): each vector gets a
    * 16-bit sign signature against fixed hyperplanes, two 8-bit bands
    * propose candidates, Hamming ≤ 2 pre-filters, exact cosine ≥ 0.40
    * verifies. Bit-signature candidates shuffle 2 longs per vector — at
    * 100 TB the banded self-join moves signatures, never embeddings; only
    * verified candidates touch the vectors again.
    */
  private def q54(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
    // codegen'd kernel: all 16 bit projections in one static call per row
    // (the zip_with/aggregate-per-bit formulation is interpreted and was
    // the slowest item in the bench). Only (vec_id, sig) is cached — two
    // longs per vector; pinning the embedding arrays for the session would
    // evict caches other queries actually reuse. The verify joins rescan
    // the (small) embeddings parquet instead.
    val sigs = e.select(col("vec_id"),
      graft.functions.VectorOps.srpSigC(col("embedding")).as("sig")).cache()
    val cand = signatureBandCandidates(
      sigs.select(col("vec_id").as("id"), col("sig")),
      bandMod = 256L, maxHamming = 2)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("hamming"))
    cand
      .join(e.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("nrm").as("na")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), col("hamming"),
        (dotD(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= 0.40)
  }

  private val q54Sql: String = {
    def planeLit(j: Int): String =
      (0 until SrpDim).map(i => srpSign(j, i)).mkString("[", ", ", "]")
    val bitTerms = (0 until SrpBits).map { j =>
      s"""(CASE WHEN list_sum(list_transform(range(1, ${SrpDim + 1}),
         |  i -> CAST(embedding[i] AS DOUBLE) * (${planeLit(j)})[i])) > 0
         |  THEN ${1L << j} ELSE 0 END)""".stripMargin
    }.mkString("\n + ")
    s"""WITH sigs AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |         CAST($bitTerms AS BIGINT) AS sig
       |  FROM embeddings),
       |banded0 AS (
       |  SELECT vec_id, sig, 0 AS band, sig % 256 AS bval FROM sigs
       |  UNION ALL
       |  SELECT vec_id, sig, 1 AS band, sig // 256 AS bval FROM sigs),
       |banded AS (
       |  SELECT vec_id, sig, band, bval FROM banded0
       |  QUALIFY count(*) OVER (PARTITION BY band, bval) <= $MaxBandBucket),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b,
       |         CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.bval = y.bval AND x.vec_id < y.vec_id
       |  WHERE bit_count(xor(x.sig, y.sig)) <= 2)
       |SELECT c.vec_a, c.vec_b, c.hamming,
       |       list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
       |         / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
       |            * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
       |FROM cand c
       |JOIN sigs a ON a.vec_id = c.vec_a
       |JOIN sigs b ON b.vec_id = c.vec_b
       |WHERE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
       |        / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
       |           * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= 0.40""".stripMargin
  }

  /** Q55: deterministic stratified sampling — the training-data mixture
    * primitive: hash-gate each doc at a per-stratum rate (40% here), so the
    * sample is reproducible across engines/runs and needs no RNG state.
    * One narrow row-level pass; at 100 TB the gate is applied at the scan.
    */
  private def q55(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val gate = TextOps.portableHashC(
      concat(lit("smp:"), col("doc_id").cast("string"))) % 100
    d.filter(gate < 40)
      .select(col("doc_id"), col("source"), col("lang"), gate.as("gate"))
  }

  private val q55Sql =
    s"""SELECT doc_id, source, lang,
       |       ${StrHashSql.format("'smp:' || CAST(doc_id AS VARCHAR)")} % 100 AS gate
       |FROM documents
       |WHERE ${StrHashSql.format("'smp:' || CAST(doc_id AS VARCHAR)")} % 100 < 40""".stripMargin

  /** Q56: length bucketing for sequence packing — docs binned by token
    * count (16-token bins, capped), with per-bucket packed-sequence
    * estimates at a 512-token context: the planning pass a training-data
    * packer runs before writing shards. Pure integral arithmetic.
    */
  private def q56(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val nt = size(split(col("text"), " ")).cast("long")
    val bucket = least(expr("cast(size(split(text, ' ')) as bigint) div 16"), lit(8L))
    d.select(bucket.as("bucket"), nt.as("nt"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("sum_tokens"),
        min(col("nt")).as("min_tokens"),
        max(col("nt")).as("max_tokens"),
        ceil(sum(col("nt")).cast("double") / 512.0).cast("long").as("packed_seqs_512"))
  }

  private val q56Sql =
    """SELECT least(len(string_split(text, ' ')) // 16, 8) AS bucket,
      |       count(*) AS n_docs,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
      |       CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
      |       CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
      |       CAST(ceil(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / 512.0) AS BIGINT)
      |         AS packed_seqs_512
      |FROM documents
      |GROUP BY 1""".stripMargin

  /** Q57: TF-IDF keyword extraction — top-3 salient tokens per document.
    * Corpus pass 1 computes document frequency per token (one hash agg);
    * pass 2 joins tf × rarity and ranks per doc. The rarity weight is the
    * INTEGRAL `(N*1000) div df` instead of `ln(N/df)` — same ranking
    * monotonicity, but exact integer arithmetic on both engines (ln's last
    * ulp differs across libm implementations and could flip rank ties).
    * All shuffles keyed by token or doc; nothing is all-pairs.
    */
  private def q57(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val toks = d.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df_ = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = d.count() // driver-side scalar, metadata-sized
    val scored = tf.join(df_, "token")
      .select(col("doc_id"), col("token"),
        (col("tf") * expr(s"${nDocs * 1000L} div df")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
  }

  private val q57Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dfreq AS (
      |  SELECT token, count(*) AS df
      |  FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.token,
      |         tf.tf * ((n.n_docs * 1000) // dfreq.df) AS score
      |  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
      |SELECT doc_id, token, score, CAST(rnk AS BIGINT) AS rnk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |                               ORDER BY score DESC, token) AS rnk
      |  FROM scored) t
      |WHERE rnk <= 3""".stripMargin

  // ---- Q88 domain mixture / Q89 repetition filter ------------------------

  /** Q88: domain-mixture rebalancing — the sampling step that reshapes a
    * multi-source corpus toward a target per-source token budget before
    * training. Each source's keep-rate (in permille, integer math so both
    * engines agree bit-for-bit) is `min(1000, 700 * min_src_chars /
    * src_chars)` — sources over the budget are down-sampled toward the
    * smallest source's character mass. Per-row keep decisions are the
    * deterministic portable-hash gate (same mechanism as Q55), so the
    * sample is reproducible run-to-run and node-to-node.
    *
    * Scale shape: one 20-key partial-agg shuffle for the per-source stats,
    * the tiny rate table broadcast back, and one more 20-key agg — the
    * 100 TB corpus itself is scanned exactly once per agg with map-side
    * combine; nothing row-level ever shuffles.
    */
  private def q88(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val srcStats = d.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("src_chars"))
    val minChars = srcStats.agg(min(col("src_chars")).as("min_chars"))
    val rates = srcStats.crossJoin(broadcast(minChars))
      .select(col("source"),
        least(lit(1000L), expr("(700 * min_chars) div src_chars")).as("rate_permille"))
    val gate = TextOps.portableHashC(
      concat(lit("mix:"), col("doc_id").cast("string"))) % 1000
    d.select(col("doc_id"), col("source"), col("n_chars"), gate.as("gate"))
      .join(broadcast(rates), "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("src_chars"),
        min(col("rate_permille")).as("rate_permille"),
        sum(when(col("gate") < col("rate_permille"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("gate") < col("rate_permille"), col("n_chars")).otherwise(0L))
          .as("kept_chars"))
  }

  private val q88Sql =
    s"""WITH s AS (SELECT source, sum(n_chars) AS src_chars
       |           FROM documents GROUP BY 1),
       |m AS (SELECT min(src_chars) AS min_chars FROM s),
       |r AS (SELECT source,
       |             least(1000, (700 * min_chars) // src_chars) AS rate_permille
       |      FROM s, m),
       |k AS (SELECT d.source, d.n_chars, r.rate_permille,
       |             ${StrHashSql.format("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000 AS gate
       |      FROM documents d JOIN r USING (source))
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS src_chars,
       |       CAST(min(rate_permille) AS BIGINT) AS rate_permille,
       |       CAST(sum(CASE WHEN gate < rate_permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN gate < rate_permille THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
       |FROM k GROUP BY 1""".stripMargin

  /** Q89: repetition-based quality filter (the Gopher/RefinedWeb family):
    * per document, the top-unigram mass fraction and the duplicate-2-gram
    * fraction, plus a keep flag at the corpus-calibrated thresholds. The
    * five integer counters come from the one-pass codegen'd
    * [[graft.functions.TextOps.repStats]] kernel; the fractions divide
    * those identical longs on both engines, so the doubles match exactly.
    * Row-level only — at 100 TB this is a map-only pass with no shuffle.
    */
  private def q89(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val withStats = d
      .select(col("doc_id"), TextOps.repStatsC(lower(col("text"))).as("r"))
      .select(col("doc_id"),
        element_at(col("r"), 1).as("n_words"),
        element_at(col("r"), 2).as("n_distinct_words"),
        (element_at(col("r"), 3).cast("double") / element_at(col("r"), 1))
          .as("top_word_frac"),
        when(element_at(col("r"), 4) === 0, lit(0.0))
          .otherwise(lit(1.0) -
            element_at(col("r"), 5).cast("double") / element_at(col("r"), 4))
          .as("dup_2gram_frac"))
    withStats.withColumn("keep",
      col("top_word_frac") <= 0.09 && col("dup_2gram_frac") <= 0.12)
  }

  private val q89Sql =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |g AS (SELECT doc_id, w,
      |             list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bg
      |      FROM t),
      |uni AS (SELECT doc_id, u AS tok, count(*) AS c
      |        FROM (SELECT doc_id, unnest(w) AS u FROM t) GROUP BY 1, 2),
      |topw AS (SELECT doc_id, max(c) AS topc FROM uni GROUP BY 1),
      |s AS (SELECT g.doc_id, len(g.w) AS tw, len(list_distinct(g.w)) AS dw,
      |             tp.topc, len(g.bg) AS t2, len(list_distinct(g.bg)) AS d2
      |      FROM g JOIN topw tp ON tp.doc_id = g.doc_id)
      |SELECT doc_id,
      |       CAST(tw AS BIGINT) AS n_words,
      |       CAST(dw AS BIGINT) AS n_distinct_words,
      |       CAST(topc AS DOUBLE) / tw AS top_word_frac,
      |       CASE WHEN t2 = 0 THEN 0.0
      |            ELSE 1.0 - CAST(d2 AS DOUBLE) / t2 END AS dup_2gram_frac,
      |       (CAST(topc AS DOUBLE) / tw <= 0.09 AND
      |        (CASE WHEN t2 = 0 THEN 0.0
      |              ELSE 1.0 - CAST(d2 AS DOUBLE) / t2 END) <= 0.12) AS keep
      |FROM s""".stripMargin

  // ---- Q90 incremental dedup / Q91 decode stub / Q92 sketch accuracy -----

  /** Q90: incremental corpus dedup — the production shape: a NEW batch (the
    * perturbed additions plus every doc_id%10==7 original) is deduped
    * against the EXISTING corpus without ever re-deduping the corpus
    * itself. Stage 1 drops exact duplicates by hash anti-lookup against the
    * old side's key set; stage 2 bands the survivors' MinHash signatures
    * and joins them against the old side's banded index (hot old buckets
    * capped at [[MaxBandBucket]], mirrored in the oracle), then
    * Jaccard-verifies candidates row-level. Output: one verdict per new doc
    * (`exact_dup` / `near_dup` / `kept`).
    *
    * Scale shape: at 100 TB the old side's `(band, bandkey)` table is a
    * PERSISTED index (built once, appended per batch) — each incoming batch
    * shuffles only its own bands and candidate pairs, never the corpus.
    * Here the index is rebuilt from the fixture because declared queries
    * are stateless, but the dataflow after the build is exactly the
    * incremental one: new-side rows join INTO the index, nothing self-joins.
    */
  private def q90(spark: SparkSession, sfDir: String): DataFrame = {
    val c = corpus(spark, sfDir)
    val isNew = col("doc_id") >= 100000 || col("doc_id") % 10 === 7
    // cached: the kernel pass feeds the old side three times (key set,
    // band index, verify texts) and the new side twice
    val sigged = c
      .select(col("doc_id"), col("text"),
        TextOps.minhashSigC(col("text"), 3).as("sig"),
        TextOps.shingleCountC(col("text"), 3).as("n"))
      .cache()
    val oldS = sigged.filter(!isNew)
    val oldKeys = oldS.select(md5(col("text")).as("k")).distinct()
    val exact = sigged.filter(isNew)
      .withColumn("k", md5(col("text")))
      .join(oldKeys.withColumn("exact_hit", lit(true)), Seq("k"), "left_outer")
      .select(col("doc_id"), col("text"), col("sig"), col("n"),
        coalesce(col("exact_hit"), lit(false)).as("is_exact"))
      .cache()
    val oldBands = capBuckets(
      minhashBands(oldS.filter(size(col("sig")) > 0)),
      Seq("band", "bandkey"), MaxBandBucket)
    val newBands = minhashBands(
      exact.filter(!col("is_exact") && size(col("sig")) > 0))
    val cand = newBands.as("nb")
      .join(oldBands.as("ob"),
        col("nb.band") === col("ob.band") && col("nb.bandkey") === col("ob.bandkey"))
      .select(col("nb.doc_id").as("new_id"), col("ob.doc_id").as("old_id"))
      .distinct()
    val nearIds = cand
      .join(exact.select(col("doc_id").as("new_id"), col("text").as("ta"),
        col("n").as("na")), "new_id")
      .join(oldS.select(col("doc_id").as("old_id"), col("text").as("tb"),
        col("n").as("nb")), "old_id")
      .withColumn("common", TextOps.shingleCommonC(col("ta"), col("tb"), 3))
      .filter(col("common").cast("double") /
        (col("na") + col("nb") - col("common")) >= JaccardThreshold)
      .select(col("new_id").as("doc_id")).distinct()
    exact
      .join(nearIds.withColumn("near_hit", lit(true)), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("is_exact"), lit("exact_dup"))
          .when(coalesce(col("near_hit"), lit(false)), lit("near_dup"))
          .otherwise(lit("kept")).as("verdict"))
  }

  private val q90Sql = {
    val famRows = Family.map { case (i, a, b) => s"($i, $a, $b)" }.mkString(", ")
    s"""WITH $CorpusSql,
       |$ShinglesSql,
       |newdocs AS (SELECT * FROM corpus WHERE doc_id >= 100000 OR doc_id % 10 = 7),
       |olddocs AS (SELECT * FROM corpus WHERE NOT (doc_id >= 100000 OR doc_id % 10 = 7)),
       |oldkeys AS (SELECT DISTINCT md5(text) AS k FROM olddocs),
       |exact AS (
       |  SELECT n.doc_id, (ok.k IS NOT NULL) AS is_exact
       |  FROM newdocs n LEFT JOIN oldkeys ok ON md5(n.text) = ok.k),
       |fam AS (SELECT * FROM (VALUES $famRows) f(i, a, b)),
       |mh AS (SELECT doc_id, i, min((a * h + b) % $MinhashP) AS mh
       |       FROM shh, fam GROUP BY 1, 2),
       |bands0 AS (
       |  SELECT doc_id, (i - 1) // $BandRows AS band,
       |         sum(mh * (CASE (i - 1) % $BandRows
       |                   WHEN 0 THEN 1 WHEN 1 THEN 31 ELSE 961 END)) AS bandkey
       |  FROM mh GROUP BY 1, 2),
       |oldbands AS (
       |  SELECT doc_id, band, bandkey FROM bands0
       |  WHERE doc_id IN (SELECT doc_id FROM olddocs)
       |  QUALIFY count(*) OVER (PARTITION BY band, bandkey) <= $MaxBandBucket),
       |newbands AS (
       |  SELECT b.doc_id, band, bandkey FROM bands0 b
       |  JOIN exact e ON e.doc_id = b.doc_id AND NOT e.is_exact),
       |cand AS (
       |  SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
       |  FROM newbands nb JOIN oldbands ob
       |    ON nb.band = ob.band AND nb.bandkey = ob.bandkey),
       |sz AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY 1),
       |inter AS (
       |  SELECT c.new_id, c.old_id, count(*) AS n_common
       |  FROM cand c
       |  JOIN shh sa ON sa.doc_id = c.new_id
       |  JOIN shh sb ON sb.doc_id = c.old_id AND sb.s = sa.s
       |  GROUP BY 1, 2),
       |neardup AS (
       |  SELECT DISTINCT i.new_id FROM inter i
       |  JOIN sz za ON za.doc_id = i.new_id
       |  JOIN sz zb ON zb.doc_id = i.old_id
       |  WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= $JaccardThreshold)
       |SELECT e.doc_id,
       |       CASE WHEN e.is_exact THEN 'exact_dup'
       |            WHEN nd.new_id IS NOT NULL THEN 'near_dup'
       |            ELSE 'kept' END AS verdict
       |FROM exact e LEFT JOIN neardup nd ON nd.new_id = e.doc_id""".stripMargin
  }

  /** Q91: multimodal header decode — typed `mapPartitions` over the binary
    * payload column, batching rows in groups of 64 the way a real
    * vectorized decoder (JNI / external process) is fed, and the decode
    * body is now REAL public-format parsing
    * ([[graft.functions.MediaHeaders]]): PNG signature + IHDR (big-endian
    * dims, bit depth, color type → channels) and JPEG marker-segment
    * walking to the SOF0 frame header — the header-geometry pass a 100 TB
    * ingest pipeline runs on every object before any pixel work is
    * scheduled. The fixture derivation wraps each document's bytes in a
    * spec-shaped header (even ids PNG — real CRC32 IHDR; odd ids JPEG —
    * APP0 + variable-length COM segment, so the parser must walk markers,
    * not read fixed offsets); geometry derives from doc_id arithmetic, so
    * the DuckDB oracle states the expected parse in pure SQL while the
    * Spark side actually reads it back out of the bytes. Pixel decode
    * stays out of scope (no codecs in this container) — header parse,
    * corrupt-input rejection, and the batch plumbing are the real thing.
    * Both stages are map-only: no shuffle at any scale.
    */
  private def q91(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.MediaHeaders
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("body"))
      .as[(Long, Array[Byte])]
    // fixture derivation: wrap each body in a real format header (the
    // synthetic stand-in for "the corpus is images"); geometry from id
    // arithmetic keeps the oracle SQL-expressible
    val payloads = d.map { case (docId, body) =>
      val w = (16 + docId % 509).toInt
      val h = (16 + (docId * 7) % 509).toInt
      val header =
        if (docId % 2 == 0) {
          val colorType = (docId % 3) match {
            case 0 => 0 // grayscale
            case 1 => 2 // truecolor
            case _ => 6 // truecolor+alpha
          }
          MediaHeaders.pngHeader(w, h, bitDepth = 8, colorType = colorType)
        } else MediaHeaders.jpegHeader(w, h, commentLen = (docId % 16).toInt)
      (docId, header ++ body)
    }
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        // a real decoder consumes the whole batch in one call; header
        // parsing is per-payload byte inspection
        batch.iterator.map { case (docId, p) =>
          val h = MediaHeaders.parseImageHeader(p).getOrElse(
            throw new IllegalStateException(
              s"unparseable synthesized header for doc $docId"))
          MediaHeader(docId, h.mime, p.length.toLong,
            h.width, h.height, h.channels, h.bitDepth)
        }
      }
    }.toDF()
  }

  private val q91Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN 33 + octet_length(encode(text))
      |            ELSE 43 + (doc_id % 16) + octet_length(encode(text))
      |       END AS BIGINT) AS n_bytes,
      |  CAST(16 + doc_id % 509 AS BIGINT) AS width,
      |  CAST(16 + (doc_id * 7) % 509 AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN 3
      |            WHEN doc_id % 3 = 0 THEN 1
      |            WHEN doc_id % 3 = 1 THEN 3
      |            ELSE 4 END AS BIGINT) AS channels,
      |  CAST(8 AS BIGINT) AS bit_depth
      |FROM documents""".stripMargin

  /** Q141: audio header decode — the WAV sibling of q91's image pass,
    * completing the multimodal tier's modality coverage: each payload is a
    * spec-shaped RIFF/WAVE object ([[graft.functions.MediaHeaders]]
    * synthesis — PCM `fmt ` chunk, a variable-length `JUNK` padding chunk
    * so the parser must WALK subchunks with RIFF word alignment, never
    * read fixed offsets) and the decode extracts the routing metadata an
    * audio ingest needs before any sample work: sample rate, channels,
    * bits/sample, sample count, duration. Geometry derives from doc_id
    * arithmetic so the oracle states the expected parse in pure SQL while
    * the Spark side actually reads it back out of the bytes. Same typed
    * 64-row `mapPartitions` batching as q91; map-only — no shuffle at any
    * scale.
    */
  private def q141(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.MediaHeaders
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("body"))
      .as[(Long, Array[Byte])]
    val payloads = d.map { case (docId, body) =>
      val rate = (8000 + (docId % 8) * 1000).toInt
      val ch = (1 + docId % 2).toInt
      val bits = if (docId % 3 == 0) 8 else 16
      (docId, MediaHeaders.wavHeader(rate, ch, bits, body.length,
        junkLen = (docId % 12).toInt) ++ body)
    }
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { case (docId, p) =>
          val h = MediaHeaders.parseWavHeader(p).getOrElse(
            throw new IllegalStateException(
              s"unparseable synthesized wav header for doc $docId"))
          AudioMeta(docId, h.mime, h.sampleRate, h.channels, h.bitsPerSample,
            h.nSamples, h.nSamples * 1000L / h.sampleRate)
        }
      }
    }.toDF()
  }

  /** Q168: VIDEO container routing metadata — the third multimodal
    * modality, completing image (q50/q91) and audio (q141): synthesize a
    * spec-shaped ISO-BMFF (MP4) prefix per document (`ftyp` + a
    * 64-bit-largesize `free` pad + `moov{mvhd, trak{tkhd}}`, BOTH mvhd
    * versions exercised) over the text bytes as fake media payload, then
    * parse the REAL box structure back in typed `mapPartitions` batches —
    * timescale/duration from mvhd, presentation size from tkhd's 16.16
    * fixed-point fields. This is the per-object routing pass (duration
    * buckets, aspect filters, corrupt quarantine) a 100 TB video ingest
    * runs before any frame decode is scheduled: map-only, no shuffle.
    */
  private def q168(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.MediaHeadersMp4
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("body"))
      .as[(Long, Array[Byte])]
    val payloads = d.map { case (docId, body) =>
      val timescale = 600L + (docId % 5) * 100L
      val ticks = body.length.toLong * 100L
      val w = (320 + (docId % 4) * 160).toInt
      val h = (240 + (docId % 4) * 120).toInt
      (docId, MediaHeadersMp4.mp4Header(timescale, ticks, w, h,
        mvhdVersion = (docId % 2).toInt,
        freeLen = (docId % 16).toInt) ++ body)
    }
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { case (docId, p) =>
          val h = MediaHeadersMp4.parseMp4Header(p).getOrElse(
            throw new IllegalStateException(
              s"unparseable synthesized mp4 header for doc $docId"))
          VideoMeta(docId, h.mime, h.timescale, h.durationTicks,
            h.width, h.height, h.durationTicks * 1000L / h.timescale)
        }
      }
    }.toDF()
  }

  private val q168Sql =
    """WITH p AS (
      |  SELECT doc_id,
      |         CAST(600 + (doc_id % 5) * 100 AS BIGINT) AS timescale,
      |         CAST(octet_length(encode(text)) * 100 AS BIGINT) AS ticks,
      |         CAST(320 + (doc_id % 4) * 160 AS BIGINT) AS width,
      |         CAST(240 + (doc_id % 4) * 120 AS BIGINT) AS height
      |  FROM documents)
      |SELECT doc_id, 'video/mp4' AS mime, timescale,
      |       ticks AS duration_ticks, width, height,
      |       CAST(ticks * 1000 // timescale AS BIGINT) AS duration_ms
      |FROM p""".stripMargin

  private val q141Sql =
    """WITH p AS (
      |  SELECT doc_id,
      |         CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
      |         CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      |         CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS BIGINT) AS bits_per_sample,
      |         octet_length(encode(text)) AS nb
      |  FROM documents)
      |SELECT doc_id, 'audio/wav' AS mime, sample_rate, channels, bits_per_sample,
      |       CAST(nb // (channels * (bits_per_sample // 8)) AS BIGINT) AS n_samples,
      |       CAST((nb // (channels * (bits_per_sample // 8))) * 1000 // sample_rate
      |            AS BIGINT) AS duration_ms
      |FROM p""".stripMargin

  /** Q92: sketch-accuracy audit — for every verified near-dup pair, the
    * MinHash ESTIMATE of Jaccard (fraction of agreeing signature
    * components) against the exact Jaccard the verify stage computed. This
    * is the measurement that justifies the LSH pipeline's thresholds: at
    * 100 TB you tune band/row counts from exactly this err distribution,
    * computed on the (tiny) verified-pair set, not the corpus.
    */
  private def q92(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = corpus(spark, sfDir)
      .select(col("doc_id"), TextOps.minhashSigC(col("text"), 3).as("sig"))
      .filter(size(col("sig")) > 0)
    val agree = expr(
      "aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
    q41(spark, sfDir).select(col("doc_a"), col("doc_b"), col("jaccard"))
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        (agree.cast("double") / 12.0).as("est_jaccard"))
      .withColumn("err", abs(col("est_jaccard") - col("jaccard")))
  }

  private val q92Sql =
    s"""WITH $NearDupCtes,
       |agree AS (
       |  SELECT p.doc_a, p.doc_b,
       |         sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS n_agree
       |  FROM pairsq p
       |  JOIN mh ma ON ma.doc_id = p.doc_a
       |  JOIN mh mb ON mb.doc_id = p.doc_b AND mb.i = ma.i
       |  GROUP BY 1, 2)
       |SELECT p.doc_a, p.doc_b, p.jaccard,
       |       CAST(a.n_agree AS DOUBLE) / 12.0 AS est_jaccard,
       |       abs(CAST(a.n_agree AS DOUBLE) / 12.0 - p.jaccard) AS err
       |FROM pairsq p JOIN agree a ON a.doc_a = p.doc_a AND a.doc_b = p.doc_b""".stripMargin

  /** Q93: one Lloyd (k-means) refinement step over the IVF assignment —
    * the index-maintenance pass a production ANN system runs as the corpus
    * drifts: re-average every centroid from its members, report per-dim
    * drift vs the seed. Element sums run in the FIXED-POINT long domain
    * (`floor(double(x) * 1e6)`) so the cross-engine compare is exact —
    * float sums are fold-order-dependent, long sums are not; the division
    * back to doubles divides identical integers on both engines.
    *
    * Scale shape: posexplode → one `(cid, dim)` shuffle with map-side
    * partial sums — k·d running totals regardless of corpus size; the
    * assignment reuses [[ivfAssign]]'s cached pass shared with q44/q51/q78.
    */
  private def q93(spark: SparkSession, sfDir: String): DataFrame = {
    val assign = ivfAssign(spark, sfDir)
    val members = assign
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("cid"), col("pos").cast("long").as("pos"),
        floor(col("x").cast("double") * 1000000d).cast("long").as("micro"))
      .groupBy(col("cid"), col("pos"))
      .agg(count(lit(1)).as("n_members"), sum(col("micro")).as("s"))
    val seeds = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), posexplode(col("embedding")).as(Seq("pos", "ox")))
      .select(col("cid"), col("pos").cast("long").as("pos"),
        col("ox").cast("double").as("old_val"))
    members.join(seeds, Seq("cid", "pos"))
      .select(col("cid"), col("pos"), col("n_members"),
        (col("s").cast("double") / (col("n_members") * 1000000d)).as("centroid_val"),
        col("old_val"))
      .withColumn("shift", abs(col("centroid_val") - col("old_val")))
  }

  private val q93Sql =
    s"""WITH $IvfAssignCte,
       |m AS (
       |  SELECT cid, CAST(i - 1 AS BIGINT) AS pos,
       |         CAST(floor(v[i] * 1000000) AS BIGINT) AS micro
       |  FROM assign, unnest(range(1, len(v) + 1)) AS u(i)),
       |agg AS (
       |  SELECT cid, pos, CAST(count(*) AS BIGINT) AS n_members,
       |         CAST(sum(micro) AS BIGINT) AS s
       |  FROM m GROUP BY 1, 2),
       |old AS (
       |  SELECT cid, CAST(i - 1 AS BIGINT) AS pos, cv[i] AS old_val
       |  FROM c, unnest(range(1, len(cv) + 1)) AS u(i))
       |SELECT a.cid, a.pos, a.n_members,
       |       CAST(a.s AS DOUBLE) / (a.n_members * 1000000) AS centroid_val,
       |       o.old_val,
       |       abs(CAST(a.s AS DOUBLE) / (a.n_members * 1000000) - o.old_val) AS shift
       |FROM agg a JOIN old o ON o.cid = a.cid AND o.pos = a.pos""".stripMargin

  /** Q94: STREAMING incremental near-dup detection — q90's in-flight twin.
    * The new batch arrives as a stream (readStream over the fixture, the
    * same derivation of additions + %10==7 originals); each micro-batch's
    * rows compute their minhash bands ROW-LEVEL (the codegen kernel needs
    * no state), drop exact duplicates via a stream-static key lookup, join
    * their bands INTO the static capped old-side band index, dedup
    * candidate pairs with stateful `dropDuplicates`, and Jaccard-verify
    * against the static old texts. Output: verified near-dup pairs as they
    * are found (append mode, AvailableNow).
    *
    * Scale shape: the only streaming state is the candidate-pair dedup set
    * (tiny — pairs, not corpus); every join is stream-static against the
    * persisted index, so an unbounded doc stream needs bounded memory.
    */
  private def q94(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/documents.parquet"
    val schema = Tables.documents(spark, sfDir).schema
    val src = spark.readStream.schema(schema)
      .parquet(graft.streaming.StreamQueries.streamableDir(path))
    // same new-batch derivation as q90's corpus split, from the stream
    val newBatch = src.select(explode(array(
        when(col("doc_id") % 10 === 0,
          struct((col("doc_id") + 100000).as("doc_id"),
            lower(concat(col("text"), lit(" graft dup tail"))).as("text"))),
        when(col("doc_id") % 10 === 7,
          struct(col("doc_id"), lower(col("text")).as("text"))))).as("r"))
      .filter(col("r").isNotNull).select(col("r.doc_id"), col("r.text"))
    // static sides: the existing corpus's key set and capped band index
    val c = corpus(spark, sfDir)
    val isNew = col("doc_id") >= 100000 || col("doc_id") % 10 === 7
    val oldS = c.filter(!isNew)
      .select(col("doc_id"), col("text"),
        TextOps.minhashSigC(col("text"), 3).as("sig"),
        TextOps.shingleCountC(col("text"), 3).as("n"))
    val oldKeys = oldS.select(md5(col("text")).as("k")).distinct()
    val oldBands = capBuckets(
      minhashBands(oldS.filter(size(col("sig")) > 0)),
      Seq("band", "bandkey"), MaxBandBucket)
    val streamBands = minhashBands(
      newBatch
        .withColumn("k", md5(col("text")))
        .join(oldKeys.withColumn("exact_hit", lit(true)), Seq("k"), "left_outer")
        .filter(col("exact_hit").isNull)
        .select(col("doc_id"), col("text"),
          TextOps.minhashSigC(col("text"), 3).as("sig"),
          TextOps.shingleCountC(col("text"), 3).as("n"))
        .filter(size(col("sig")) > 0))
    val cand = streamBands.as("nb")
      .join(oldBands.as("ob"),
        col("nb.band") === col("ob.band") && col("nb.bandkey") === col("ob.bandkey"))
      .select(col("nb.doc_id").as("new_id"), col("ob.doc_id").as("old_id"))
      .dropDuplicates("new_id", "old_id")
    val verified = cand
      .join(corpus(spark, sfDir).filter(isNew)
        .select(col("doc_id").as("new_id"), col("text").as("ta"),
          TextOps.shingleCountC(col("text"), 3).as("na")), "new_id")
      .join(oldS.select(col("doc_id").as("old_id"), col("text").as("tb"),
        col("n").as("nb")), "old_id")
      .withColumn("n_common", TextOps.shingleCommonC(col("ta"), col("tb"), 3))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("new_id"), col("old_id"), col("n_common"), col("jaccard"))
    graft.streaming.StreamQueries.runAppend(verified)
  }

  private val q94Sql = {
    val famRows = Family.map { case (i, a, b) => s"($i, $a, $b)" }.mkString(", ")
    s"""WITH $CorpusSql,
       |$ShinglesSql,
       |newdocs AS (SELECT * FROM corpus WHERE doc_id >= 100000 OR doc_id % 10 = 7),
       |olddocs AS (SELECT * FROM corpus WHERE NOT (doc_id >= 100000 OR doc_id % 10 = 7)),
       |oldkeys AS (SELECT DISTINCT md5(text) AS k FROM olddocs),
       |survivors AS (
       |  SELECT n.doc_id FROM newdocs n LEFT JOIN oldkeys ok ON md5(n.text) = ok.k
       |  WHERE ok.k IS NULL),
       |fam AS (SELECT * FROM (VALUES $famRows) f(i, a, b)),
       |mh AS (SELECT doc_id, i, min((a * h + b) % $MinhashP) AS mh
       |       FROM shh, fam GROUP BY 1, 2),
       |bands0 AS (
       |  SELECT doc_id, (i - 1) // $BandRows AS band,
       |         sum(mh * (CASE (i - 1) % $BandRows
       |                   WHEN 0 THEN 1 WHEN 1 THEN 31 ELSE 961 END)) AS bandkey
       |  FROM mh GROUP BY 1, 2),
       |oldbands AS (
       |  SELECT doc_id, band, bandkey FROM bands0
       |  WHERE doc_id IN (SELECT doc_id FROM olddocs)
       |  QUALIFY count(*) OVER (PARTITION BY band, bandkey) <= $MaxBandBucket),
       |newbands AS (
       |  SELECT b.doc_id, band, bandkey FROM bands0 b
       |  JOIN survivors s ON s.doc_id = b.doc_id),
       |cand AS (
       |  SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
       |  FROM newbands nb JOIN oldbands ob
       |    ON nb.band = ob.band AND nb.bandkey = ob.bandkey),
       |sz AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY 1),
       |inter AS (
       |  SELECT c.new_id, c.old_id, count(*) AS n_common
       |  FROM cand c
       |  JOIN shh sa ON sa.doc_id = c.new_id
       |  JOIN shh sb ON sb.doc_id = c.old_id AND sb.s = sa.s
       |  GROUP BY 1, 2)
       |SELECT i.new_id, i.old_id, CAST(i.n_common AS BIGINT) AS n_common,
       |       CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
       |FROM inter i
       |JOIN sz za ON za.doc_id = i.new_id
       |JOIN sz zb ON zb.doc_id = i.old_id
       |WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= $JaccardThreshold""".stripMargin
  }

  // ---- Q101 quantization audit / Q102 ANN recall -------------------------

  /** Per-vector int8 scalar quantization: `floor(x * 127/max|x| + 0.5)` —
    * the memory-reduction lever of large-scale ANN (4× smaller vectors,
    * integer dot products). All-zero vectors quantize to zero. One
    * codegen'd kernel call per row ([[graft.functions.VectorOps.quantizeInt8]]);
    * the earlier staged-projection formulation was re-inlined by
    * `CollapseProject` into an O(d²)-per-row lambda no matter how the
    * scale was hoisted, so the whole pass lives in one opaque kernel.
    */
  private def quantized(v: Column): Column =
    graft.functions.VectorOps.quantizeInt8C(v)

  /** Q101: quantization-accuracy audit — for q42's broadcast query set,
    * the top-5 exact-cosine neighbors with their INT8-quantized cosine and
    * the absolute error. The quantized dot runs on small exact integers
    * (|q| ≤ 127), so both engines' sums are exact and the audit doubles
    * match bit for bit. This is the measurement that justifies shipping a
    * quantized index: err quantiles here decide whether recall at the next
    * tier is acceptable. Same scale shape as q42 (broadcast query set,
    * row-level kernels, one top-k window).
    */
  private def q101(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        normD(col("embedding")).as("nrm"),
        quantized(col("embedding")).as("qv"))
      .withColumn("qnrm", sqrt(dotD(col("qv"), col("qv"))))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("q_nrm"), col("qv").as("qqv"), col("qnrm").as("q_qnrm"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid") && col("qnrm") > 0 && col("q_qnrm") > 0)
      .select(col("qid"), col("vec_id"),
        (dotD(col("qe"), col("embedding")) / (col("nrm") * col("q_nrm"))).as("cos_exact"),
        (dotD(col("qqv"), col("qv")) / (col("qnrm") * col("q_qnrm"))).as("cos_q"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= 5)
      .withColumn("err", abs(col("cos_exact") - col("cos_q")))
  }

  private val q101Sql =
    """WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |            FROM embeddings),
      |e AS (
      |  SELECT vec_id, v,
      |         list_transform(v, x -> floor(x * (CASE WHEN mx = 0 THEN 0
      |                                           ELSE 127.0 / mx END) + 0.5)) AS qv
      |  FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx
      |        FROM e0) t),
      |n AS (
      |  SELECT vec_id, v, qv,
      |         sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]))) AS nrm,
      |         sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * qv[i]))) AS qnrm
      |  FROM e),
      |q AS (SELECT vec_id AS qid, v AS qe, qv AS qqv, nrm AS q_nrm, qnrm AS q_qnrm
      |      FROM n WHERE vec_id < 8),
      |p AS (
      |  SELECT q.qid, n.vec_id,
      |         list_sum(list_transform(range(1, len(n.v) + 1), i -> n.v[i] * q.qe[i]))
      |           / (n.nrm * q.q_nrm) AS cos_exact,
      |         list_sum(list_transform(range(1, len(n.qv) + 1), i -> n.qv[i] * q.qqv[i]))
      |           / (n.qnrm * q.q_qnrm) AS cos_q
      |  FROM n, q
      |  WHERE n.vec_id <> q.qid AND n.qnrm > 0 AND q.q_qnrm > 0)
      |SELECT qid, vec_id, cos_exact, cos_q, CAST(rn AS BIGINT) AS rn,
      |       abs(cos_exact - cos_q) AS err
      |FROM (SELECT *, row_number() OVER (PARTITION BY qid
      |                                   ORDER BY cos_exact DESC, vec_id) AS rn
      |      FROM p) t
      |WHERE rn <= 5""".stripMargin

  /** Q102: ANN quality audit — recall@3 of the IVF own-bucket probe (q44)
    * against the exact brute-force top-3 for the SAME query set. The number
    * a production ANN deployment watches: bucketed probing trades this
    * recall for the candidate-set reduction, and the per-query breakdown
    * shows which queries sit on centroid boundaries (the q78 nprobe=2
    * motivation). Integer intersection counts divided once → exact doubles.
    */
  private def q102(spark: SparkSession, sfDir: String): DataFrame = {
    val approx = q44(spark, sfDir).select(col("qid"), col("vec_id"))
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
    val qs = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qnrm"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (dotD(col("qe"), col("embedding")) / (col("nrm") * col("qnrm"))).as("cos"))
      .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id"))
    val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    qs.select(col("qid"))
      .join(hits, Seq("qid"), "left_outer")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / 3.0)
  }

  private val q102Sql =
    s"""WITH $IvfAssignCte,
      |q44q AS (SELECT vec_id AS qid, v AS qv, cid FROM assign WHERE vec_id % 50 = 0),
      |q44p AS (
      |  SELECT q.qid, a.vec_id,
      |         list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * q.qv[i]))
      |           / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
      |              * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos
      |  FROM q44q q JOIN assign a ON a.cid = q.cid AND a.vec_id <> q.qid),
      |approx AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      |    FROM q44p) t
      |  WHERE rn <= 3),
      |qset AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 50 = 0),
      |ep AS (
      |  SELECT q.qid, e.vec_id,
      |         list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * q.qv[i]))
      |           / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
      |              * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos
      |  FROM e, qset q WHERE e.vec_id <> q.qid),
      |exact AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      |    FROM ep) t
      |  WHERE rn <= 3),
      |hits AS (
      |  SELECT x.qid, count(*) AS n_hits
      |  FROM exact x JOIN approx a ON a.qid = x.qid AND a.vec_id = x.vec_id
      |  GROUP BY 1)
      |SELECT q.qid, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      |       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 3.0 AS recall
      |FROM qset q LEFT JOIN hits h ON h.qid = q.qid""".stripMargin

  // ---- registry ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_dedup_exact" -> (q40 _),
    "q41_neardup_minhash" -> (q41 _),
    "q42_cosine_topk" -> (q42 _),
    "q43_text_stats" -> (q43 _),
    "q44_ann_ivf" -> (q44 _),
    "q45_langid" -> (q45 _),
    "q46_quality" -> (q46 _),
    "q47_fingerprint" -> (q47 _),
    "q48_simhash" -> (q48 _),
    "q49_simhash_neardup" -> (q49 _),
    "q50_multimodal" -> (q50 _),
    "q51_embed_neardup" -> (q51 _),
    "q52_scrub" -> (q52 _),
    "q53_dedup_clusters" -> (q53 _),
    "q54_srp_neardup" -> (q54 _),
    "q55_sample_stratified" -> (q55 _),
    "q56_length_buckets" -> (q56 _),
    "q57_tfidf" -> (q57 _),
    "q58_bpe_tokens" -> (q58 _),
    "q59_frame_sample" -> (q59 _),
    "q78_ann_nprobe" -> (q78 _),
    "q81_ngram_jaccard" -> (q81 _),
    "q85_chunking" -> (q85 _),
    "q86_decontaminate" -> (q86 _),
    "q88_domain_mix" -> (q88 _),
    "q89_repetition" -> (q89 _),
    "q90_incremental_dedup" -> (q90 _),
    "q91_header_decode" -> (q91 _),
    "q92_sketch_accuracy" -> (q92 _),
    "q93_kmeans_step" -> (q93 _),
    "q94_stream_neardup" -> (q94 _),
    "q101_quantized_cosine" -> (q101 _),
    "q102_ann_recall" -> (q102 _),
    "q118_semantic_dedup" -> (q118 _),
    "q132_span_dedup" -> (q132 _),
    "q133_shard_pack" -> (q133 _),
    "q134_quality_filter" -> (q134 _),
    "q139_boilerplate" -> (q139 _),
    "q140_bloom_decontam" -> (q140 _),
    "q141_audio_meta" -> (q141 _),
    "q168_video_meta" -> (q168 _))

  val oracleSql: Map[String, String] = Map(
    "q40_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) = 1""".stripMargin,
    "q41_neardup_minhash" -> q41Sql,
    "q42_cosine_topk" -> q42Sql,
    "q43_text_stats" -> q43Sql,
    "q44_ann_ivf" -> q44Sql,
    "q45_langid" -> q45Sql,
    "q46_quality" -> q46Sql,
    "q47_fingerprint" -> q47Sql,
    "q48_simhash" -> q48Sql,
    "q49_simhash_neardup" -> q49Sql,
    "q50_multimodal" -> q50Sql,
    "q51_embed_neardup" -> q51Sql,
    "q118_semantic_dedup" -> q118Sql,
    "q132_span_dedup" -> q132Sql,
    "q133_shard_pack" -> q133Sql,
    "q134_quality_filter" -> q134Sql,
    "q52_scrub" -> q52Sql,
    "q53_dedup_clusters" -> q53Sql,
    "q54_srp_neardup" -> q54Sql,
    "q55_sample_stratified" -> q55Sql,
    "q56_length_buckets" -> q56Sql,
    "q57_tfidf" -> q57Sql,
    "q58_bpe_tokens" -> q58Sql,
    "q59_frame_sample" -> q59Sql,
    "q78_ann_nprobe" -> q78Sql,
    "q81_ngram_jaccard" -> q81Sql,
    "q85_chunking" -> q85Sql,
    "q86_decontaminate" -> q86Sql,
    "q88_domain_mix" -> q88Sql,
    "q89_repetition" -> q89Sql,
    "q90_incremental_dedup" -> q90Sql,
    "q91_header_decode" -> q91Sql,
    "q92_sketch_accuracy" -> q92Sql,
    "q93_kmeans_step" -> q93Sql,
    "q94_stream_neardup" -> q94Sql,
    "q101_quantized_cosine" -> q101Sql,
    "q102_ann_recall" -> q102Sql,
    "q139_boilerplate" -> q139Sql,
    "q140_bloom_decontam" -> q140Sql,
    "q141_audio_meta" -> q141Sql,
    "q168_video_meta" -> q168Sql)
}

/** Typed output row of the q91 header decode — the geometry a real header
  * parse emits (mime + dims + channels + bit depth).
  */
case class MediaHeader(doc_id: Long, mime: String, n_bytes: Long, width: Long,
    height: Long, channels: Long, bit_depth: Long)

/** Typed output row of the q141 audio header decode — PCM routing
  * geometry (rate, channels, sample width, duration).
  */
case class AudioMeta(doc_id: Long, mime: String, sample_rate: Long,
    channels: Long, bits_per_sample: Long, n_samples: Long, duration_ms: Long)

/** Typed output row of the q168 video container decode — movie clock and
  * presentation geometry.
  */
case class VideoMeta(doc_id: Long, mime: String, timescale: Long,
    duration_ticks: Long, width: Long, height: Long, duration_ms: Long)
